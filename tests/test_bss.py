"""BSS Eval property tests (the published algorithm's defining behaviours).

mir_eval isn't installed in this image; if it ever is, the gated golden test
at the bottom checks exact parity.
"""

import numpy as np
import pytest

from svs_tpu.evaluation import bss

SR = 8192


def _sources(rng, t=SR * 3):
    a = rng.standard_normal(t) * 0.3
    b = np.sin(2 * np.pi * 440 * np.arange(t) / SR) * 0.3
    return np.stack([a, b])


def test_perfect_estimate_has_huge_sdr(rng):
    refs = _sources(rng)
    sdr, sir, sar, perm = bss.bss_eval_sources(refs, refs.copy())
    assert (sdr > 100).all() and (sir > 100).all()
    np.testing.assert_array_equal(perm, [0, 1])


def test_scale_invariance(rng):
    refs = _sources(rng)
    ests = refs * np.array([[0.5], [2.0]])
    sdr, _, _, _ = bss.bss_eval_sources(refs, ests)
    assert (sdr > 100).all()  # gain absorbed by the projection filter


def test_short_filter_absorbed(rng):
    """A <512-tap FIR of the reference is 'allowed distortion' in BSS eval —
    the core property distinguishing it from naive SNR."""
    from scipy.signal import lfilter
    # two independent noise sources: a pure sine would make the Gram matrix
    # of delayed references rank-deficient and pollute the solve
    refs = np.stack([rng.standard_normal(SR * 3) * 0.3,
                     rng.standard_normal(SR * 3) * 0.3])
    h = np.zeros(64)
    h[0], h[13], h[40] = 1.0, -0.4, 0.2
    ests = np.stack([lfilter(h, [1.0], refs[0]), refs[1]])
    sdr, _, _, _ = bss.bss_eval_sources(refs, ests)
    # the floor here is lfilter's truncated tail (the last taps' worth of
    # samples), not projection error — verified equal to brute-force lstsq;
    # an unfiltered copy in test_perfect_estimate gets >100 dB
    assert sdr[0] > 35


def test_noisy_estimate_sdr_tracks_snr(rng):
    refs = _sources(rng)
    noise = rng.standard_normal(refs.shape[1])
    for snr_db in (10.0, 20.0):
        scale = np.sqrt(np.mean(refs[0] ** 2) /
                        (np.mean(noise ** 2) * 10 ** (snr_db / 10)))
        ests = np.stack([refs[0] + scale * noise, refs[1]])
        sdr, _, sar, _ = bss.bss_eval_sources(refs, ests)
        # projection removes the noise component correlated with the refs;
        # SDR lands near (slightly above) the injected SNR
        assert snr_db - 1.5 < sdr[0] < snr_db + 3.0


def test_permutation_detected(rng):
    refs = _sources(rng)
    swapped = refs[::-1].copy()
    sdr, _, _, perm = bss.bss_eval_sources(refs, swapped)
    np.testing.assert_array_equal(perm, [1, 0])
    assert (sdr > 100).all()


def test_silent_source_raises(rng):
    refs = _sources(rng)
    bad = refs.copy()
    bad[1] = 0
    with pytest.raises(ValueError):
        bss.bss_eval_sources(bad, refs)
    with pytest.raises(ValueError):
        bss.bss_eval_sources(refs, bad)


def test_compute_metrics_for_track(rng):
    t = SR * 3
    vocal = np.sin(2 * np.pi * 440 * np.arange(t) / SR) * 0.3
    accomp = rng.standard_normal(t) * 0.3
    mix = vocal + accomp
    # estimate: vocal with a bit of accompaniment bleed
    est = vocal + 0.1 * accomp
    m = bss.compute_metrics_for_track(mix, vocal, est)
    assert set(m) == {"SDR", "SIR", "SAR", "NSDR"}
    assert m["SDR"] > 15  # ~20 dB bleed
    assert m["NSDR"] > 10  # far better than the mixture itself
    # (near-)mixture-as-estimate has NSDR ~ 0 by definition; exact mix would
    # make the accompaniment estimate all-silent, which BSS eval rejects
    near_mix = mix + 1e-5 * rng.standard_normal(t)
    m0 = bss.compute_metrics_for_track(mix, vocal, near_mix)
    assert abs(m0["NSDR"]) < 0.5


def test_length_mismatch_raises(rng):
    refs = _sources(rng)
    with pytest.raises(ValueError):
        bss.bss_eval_sources(refs, refs[:, :-10])


# ---------------------------------------------------------------------------
# Unconditional golden parity (mir_eval isn't installable in this image —
# zero egress — so the numeric anchor is (a) pinned golden constants for a
# fixed fixture and (b) a second, INDEPENDENT brute-force implementation of
# the published BSS Eval v3 decomposition: explicit time-domain delay
# matrices + np.linalg.lstsq, no FFTs, no Toeplitz Gram trick.  The two
# implementations agree to 4e-14 dB; goldens are pinned at 1e-6.)
# ---------------------------------------------------------------------------

def _delay_matrix(ref, flen, out_len):
    m = np.zeros((out_len, flen))
    for d in range(flen):
        m[d:d + len(ref), d] = ref
    return m


def _project_bruteforce(refs, est, flen):
    nsrc, nsampl = refs.shape
    out_len = nsampl + flen - 1
    a = np.hstack([_delay_matrix(refs[i], flen, out_len)
                   for i in range(nsrc)])
    b = np.concatenate([est, np.zeros(flen - 1)])
    c, *_ = np.linalg.lstsq(a, b, rcond=None)
    return a @ c


def _bss_eval_bruteforce(refs, ests, flen=512):
    """BSS Eval v3 decomposition by direct least squares (Vincent et al. 2006
    §III): s_filt = proj onto delays of the true ref, e_interf = proj onto
    all refs minus that, e_artif = the rest.  Permutation maximises mean SIR."""
    import itertools
    nsrc = refs.shape[0]
    sdr, sir, sar = (np.empty((nsrc, nsrc)) for _ in range(3))
    for jest in range(nsrc):
        est_pad = np.concatenate([ests[jest], np.zeros(flen - 1)])
        p_all = _project_bruteforce(refs, ests[jest], flen)
        for jtrue in range(nsrc):
            s_filt = _project_bruteforce(refs[jtrue][None], ests[jest], flen)
            e_interf = p_all - s_filt
            e_artif = est_pad - p_all
            sdr[jest, jtrue] = 10 * np.log10(
                np.sum(s_filt**2) / np.sum((e_interf + e_artif)**2))
            sir[jest, jtrue] = 10 * np.log10(
                np.sum(s_filt**2) / np.sum(e_interf**2))
            sar[jest, jtrue] = 10 * np.log10(
                np.sum((s_filt + e_interf)**2) / np.sum(e_artif**2))
    perms = list(itertools.permutations(range(nsrc)))
    mean_sir = [np.mean([sir[p[k], k] for k in range(nsrc)]) for p in perms]
    popt = np.asarray(perms[int(np.argmax(mean_sir))])
    idx = (popt, np.arange(nsrc))
    return sdr[idx], sir[idx], sar[idx], popt


def _golden_fixture(t=2048, sr=SR):
    rng = np.random.default_rng(20260816)
    vocal = (np.sin(2 * np.pi * 440 * np.arange(t) / sr) * 0.3
             + 0.05 * rng.standard_normal(t))
    accomp = rng.standard_normal(t) * 0.3
    refs = np.stack([vocal, accomp])
    ests = np.stack([vocal + 0.1 * accomp + 0.02 * rng.standard_normal(t),
                     accomp + 0.05 * vocal + 0.01 * rng.standard_normal(t)])
    return refs, ests


# pinned outputs of BOTH implementations on _golden_fixture (they agree to
# 4e-14; mir_eval implements the same published decomposition)
_GOLDEN = {
    "SDR": [16.4419388834, 27.6871402152],
    "SIR": [17.5319078282, 29.7384779688],
    "SAR": [23.0552286549, 31.9345934599],
}


def test_golden_parity_unconditional():
    refs, ests = _golden_fixture()
    sdr, sir, sar, perm = bss.bss_eval_sources(refs, ests)
    np.testing.assert_array_equal(perm, [0, 1])
    np.testing.assert_allclose(sdr, _GOLDEN["SDR"], atol=1e-6)
    np.testing.assert_allclose(sir, _GOLDEN["SIR"], atol=1e-6)
    np.testing.assert_allclose(sar, _GOLDEN["SAR"], atol=1e-6)


def test_bruteforce_cross_implementation():
    """The production FFT/Toeplitz path must equal a from-scratch time-domain
    least-squares decomposition (independent of both mir_eval and bss.py)."""
    refs, ests = _golden_fixture()
    bf = _bss_eval_bruteforce(refs, ests)
    ours = bss.bss_eval_sources(refs, ests)
    np.testing.assert_array_equal(bf[3], ours[3])
    for a, b in zip(bf[:3], ours[:3]):
        np.testing.assert_allclose(a, b, atol=1e-9)


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("mir_eval"),
    reason="mir_eval not installed (golden parity is asserted unconditionally "
           "above via pinned constants + an independent implementation)",
)
def test_mir_eval_golden_parity(rng):
    import mir_eval
    refs = _sources(rng, t=SR)
    ests = np.stack([refs[0] + 0.1 * refs[1],
                     refs[1] + 0.05 * rng.standard_normal(SR)])
    ours = bss.bss_eval_sources(refs, ests)
    theirs = mir_eval.separation.bss_eval_sources(refs, ests)
    for a, b in zip(ours[:3], theirs[:3]):
        np.testing.assert_allclose(a, b, atol=1e-6)
    refs2, ests2 = _golden_fixture()
    g = mir_eval.separation.bss_eval_sources(refs2, ests2)
    np.testing.assert_allclose(g[0], _GOLDEN["SDR"], atol=1e-3)
    np.testing.assert_allclose(g[1], _GOLDEN["SIR"], atol=1e-3)
    np.testing.assert_allclose(g[2], _GOLDEN["SAR"], atol=1e-3)
