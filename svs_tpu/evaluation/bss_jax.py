"""Device-capable BSS Eval (SDR / SIR / SAR) — jitted JAX core.

SURVEY.md §2.2 keeps BSS eval host-side for parity but names the option
this module delivers: "optionally a JAX bss_eval for speed".  It computes
the same BSS Eval v3 decomposition as :mod:`svs_tpu.evaluation.bss`
(the independent numpy implementation of Vincent/Gribonval/Fevotte 2006
that stands in for mir_eval at reference evaluate.py:58,74), but as ONE
jitted program per (nsrc, n_fft, dtype) signature:

- all FFTs are shared: the reference spectra feed the Gram matrix, the
  cross-correlation vectors, and the projection filtering;
- all (estimate, true-source) pairs are solved batched — the numpy path
  re-projects per pair (bss.py:126-135), this one solves every
  single-source system in one batched ``jnp.linalg.solve`` and every
  all-sources system in one multi-RHS solve;
- energies come straight off the frequency-domain projections, so the
  whole metric matrix is a single device program with three scalar
  planes fetched at the end.

Exactness of length bucketing (why one compile serves a 2x length
range): every quantity BSS eval consumes is invariant under trailing
zero padding.  The Gram/cross correlations at lags |k| < flen are plain
sums over the signals' support; the FFT length only has to satisfy
n_fft >= T + flen - 1 for circular == linear, and padding the signals
to T' in (T, n_fft - flen + 1] adds zero terms to every sum.  The
projection filters (solve of an unchanged system) and the projected
signals' nonzero support (<= T + flen - 1 <= n_fft, no circular wrap)
are therefore unchanged, and so are all six energies.  Tests pin this
(tests/test_bss_jax.py: padded == unpadded to fp roundoff).

Precision: BSS eval conventionally runs in float64 (mir_eval and bss.py
do).  On CPU this module matches that — the core runs under a scoped
``jax.enable_x64()`` so the global f32 default of the rest of the
framework is untouched.  On TPU there is no native f64, so the default
is float32 with a documented tolerance (tests measure ~1e-3 dB on
well-conditioned material); anything non-finite falls back to the f64
numpy path per track, so results are never silently degraded.
"""

from __future__ import annotations

import functools
import itertools
import math
from typing import Dict, Optional, Tuple

import numpy as np

from . import bss as _bss_np

FLEN = _bss_np.FLEN


def _metric_matrices(refs, ests, flen: int):
    """(nsrc, Tp) padded refs/ests -> (sdr, sir, sar) matrices (nsrc, nsrc)
    indexed [jest, jtrue].  Pure jax; traced with static flen.

    Mirrors bss.py:31-94 with the decomposition identities
      s_filt            = proj(ref_jtrue        , est_jest)   ("single")
      s_filt + e_interf = proj(all refs         , est_jest)   ("all")
      e_interf + e_artif = est - single,   e_artif = est - all
    so only the two projections are ever materialised.
    """
    import jax.numpy as jnp

    nsrc, tp = refs.shape
    n_fft = int(2 ** math.ceil(math.log2(tp + flen - 1)))

    sf = jnp.fft.rfft(refs, n=n_fft, axis=1)            # (nsrc, F)
    ef = jnp.fft.rfft(ests, n=n_fft, axis=1)            # (nsrc, F)

    # Gram blocks of delayed references: ss[i, j, k] = circular corr at lag k
    ss = jnp.fft.irfft(sf[:, None] * jnp.conj(sf[None]), n=n_fft, axis=-1)
    lag = (jnp.arange(flen)[None, :] - jnp.arange(flen)[:, None]) % n_fft
    g_blocks = ss[:, :, lag]                             # [i, j, a, b]
    g_full = g_blocks.transpose(0, 2, 1, 3).reshape(nsrc * flen, nsrc * flen)

    # cross-correlations estimate <-> delayed references (bss.py:55-58)
    sse = jnp.fft.irfft(sf[None] * jnp.conj(ef[:, None]), n=n_fft, axis=-1)
    dlag = (-jnp.arange(flen)) % n_fft
    d = sse[:, :, dlag]                                  # [jest, i, a]

    # all-references projection filters: one multi-RHS solve (bss.py:61)
    c_all = jnp.linalg.solve(g_full, d.reshape(nsrc, nsrc * flen).T)
    c_all = c_all.T.reshape(nsrc, nsrc, flen)            # [jest, i, taps]
    proj_all = jnp.fft.irfft(
        (jnp.fft.rfft(c_all, n=n_fft, axis=-1) * sf[None]).sum(axis=1),
        n=n_fft, axis=-1)                                # [jest, n_fft]

    # single-reference projections: batched over jtrue, multi-RHS over jest
    g_diag = g_blocks[jnp.arange(nsrc), jnp.arange(nsrc)]   # [jtrue, a, b]
    c_single = jnp.linalg.solve(g_diag, d.transpose(1, 2, 0))
    c_single = c_single.transpose(2, 0, 1)               # [jest, jtrue, taps]
    proj_single = jnp.fft.irfft(
        jnp.fft.rfft(c_single, n=n_fft, axis=-1) * sf[None],
        n=n_fft, axis=-1)                                # [jest, jtrue, n_fft]

    est_full = jnp.concatenate(
        [ests, jnp.zeros((nsrc, n_fft - tp), ests.dtype)], axis=1)

    e_single = jnp.sum(proj_single ** 2, axis=-1)            # [jest, jtrue]
    e_all = jnp.sum(proj_all ** 2, axis=-1)                  # [jest]
    e_resid = jnp.sum((est_full[:, None] - proj_single) ** 2, axis=-1)
    e_interf = jnp.sum((proj_all[:, None] - proj_single) ** 2, axis=-1)
    e_artif = jnp.sum((est_full - proj_all) ** 2, axis=-1)   # [jest]

    tiny = jnp.finfo(refs.dtype).tiny
    db = lambda ratio: 10.0 * jnp.log10(ratio + tiny)  # noqa: E731
    sdr = db(e_single / e_resid)
    sir = db(e_single / e_interf)
    sar = jnp.broadcast_to(db(e_all / e_artif)[:, None], (nsrc, nsrc))
    return sdr, sir, sar


@functools.lru_cache(maxsize=None)
def _jitted_core(flen: int):
    import jax

    return jax.jit(functools.partial(_metric_matrices, flen=flen))


def _bucket_len(nsampl: int, flen: int) -> int:
    """Padded length: the largest T' sharing this T's FFT size, so one jit
    signature serves the whole (n_fft/2, n_fft] range of song lengths."""
    n_fft = int(2 ** math.ceil(math.log2(nsampl + flen - 1)))
    return n_fft - flen + 1


def default_dtype() -> str:
    """float64 off-TPU (metric-parity convention); float32 on TPU (no
    native f64 — documented fast path with per-track numpy fallback)."""
    import jax

    return "float32" if jax.default_backend() == "tpu" else "float64"


def _run_core(refs: np.ndarray, ests: np.ndarray, flen: int, dtype: str):
    import jax

    nsrc, nsampl = refs.shape
    tp = _bucket_len(nsampl, flen)
    pad = ((0, 0), (0, tp - nsampl))
    refs_p = np.pad(np.asarray(refs, dtype), pad)
    ests_p = np.pad(np.asarray(ests, dtype), pad)
    with jax.enable_x64(dtype == "float64"):
        sdr, sir, sar = _jitted_core(flen)(refs_p, ests_p)
        return np.asarray(sdr), np.asarray(sir), np.asarray(sar)


def bss_eval_sources(
    reference_sources: np.ndarray,
    estimated_sources: np.ndarray,
    compute_permutation: bool = True,
    dtype: Optional[str] = None,
):
    """Drop-in for :func:`svs_tpu.evaluation.bss.bss_eval_sources`, device
    path.  Same validation, same permutation rule (max mean SIR), same
    return contract; falls back to the numpy implementation per call if
    the device result is non-finite (ill-conditioned Gram in f32)."""
    refs = np.atleast_2d(np.asarray(reference_sources, np.float64))
    ests = np.atleast_2d(np.asarray(estimated_sources, np.float64))
    if refs.shape != ests.shape:
        raise ValueError("reference and estimated shapes differ: "
                         f"{refs.shape} vs {ests.shape}")
    for name, arr in (("reference", refs), ("estimated", ests)):
        if np.any(np.all(arr == 0, axis=1)):
            raise ValueError(f"all-silent {name} source present; BSS eval is "
                             "undefined (matches mir_eval behaviour)")
    dtype = dtype or default_dtype()
    nsrc = refs.shape[0]

    sdr, sir, sar = _run_core(refs, ests, FLEN, dtype)
    # +inf is legitimate (zero interference); NaN means the f32 solve broke
    if np.any(np.isnan(sdr)) or np.any(np.isnan(sir)) or np.any(
            np.isnan(sar)):
        return _bss_np.bss_eval_sources(refs, ests, compute_permutation)

    if compute_permutation:
        perms = list(itertools.permutations(range(nsrc)))
        mean_sir = [np.mean([sir[p[k], k] for k in range(nsrc)])
                    for p in perms]
        popt = np.asarray(perms[int(np.argmax(mean_sir))])
        idx = (popt, np.arange(nsrc))
        return sdr[idx], sir[idx], sar[idx], popt
    diag = (np.arange(nsrc), np.arange(nsrc))
    return sdr[diag], sir[diag], sar[diag], np.arange(nsrc)


def compute_metrics_for_track(
    mix: np.ndarray, vocal_ref: np.ndarray, vocal_est: np.ndarray,
    dtype: Optional[str] = None,
) -> Dict[str, float]:
    """Device-path twin of bss.compute_metrics_for_track (reference
    evaluate.py:26-84 semantics: 2-source eval with accompaniment = mix -
    vocal, NSDR = SDR(est) - SDR(mixture-as-estimate))."""
    min_len = min(len(mix), len(vocal_ref), len(vocal_est))
    mix = np.asarray(mix[:min_len], np.float64)
    vocal_ref = np.asarray(vocal_ref[:min_len], np.float64)
    vocal_est = np.asarray(vocal_est[:min_len], np.float64)

    refs = np.stack([vocal_ref, mix - vocal_ref])
    ests = np.stack([vocal_est, mix - vocal_est])
    sdr, sir, sar, perm = bss_eval_sources(refs, ests, dtype=dtype)
    vocal_idx = int(perm[0])  # evaluate.py:62

    sdr_mix, _, _, _ = bss_eval_sources(vocal_ref[None, :], mix[None, :],
                                        dtype=dtype)
    nsdr = float(sdr[vocal_idx]) - float(sdr_mix[0])  # evaluate.py:68-77

    return {
        "SDR": float(sdr[vocal_idx]),
        "SIR": float(sir[vocal_idx]),
        "SAR": float(sar[vocal_idx]),
        "NSDR": nsdr,
    }
