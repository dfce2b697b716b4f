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


@pytest.mark.skipif(
    not pytest.importorskip("importlib.util").find_spec("mir_eval"),
    reason="mir_eval not installed",
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
