"""Device-resident training data: the whole spectrogram dataset in HBM.

The host pipeline (``dataset.py``) ships 4 x (B, 512, L) float32 planes per
step — ~134 MB at B=32 — over the host->device link every step; on
tunnelled/slow-link rigs that LINK, not the chip, bounds end-to-end training
(docs/ROUND_NOTES round-2 demo: ~134 MB/step tunnel-bound while the step
itself is 16 ms).  Here the entire dataset is placed in HBM ONCE (songs
zero-padded into a static ``(n_songs, F, T_max)`` box per plane) and each
step's random crops are gathered on-device; the per-step host->device
traffic drops to two ``(B,)`` int32 vectors.

TPU-first design:
- static shapes — crop offsets are DATA (``lax.dynamic_slice``), not shapes,
  so one compiled gather signature serves every step of an epoch
- reference semantics unchanged: same virtual epoch (n_songs x
  samples_per_song, reference train.py:83-84) and the same shared random
  128-frame crop (train.py:119-126).  The (song, start) stream comes from
  ``PatchDataset.index_batches`` — the SAME numpy RNG sequence the host
  pipeline uses — so device and host pipelines yield bit-identical batches
  (tested in tests/test_device_data.py)
- songs shorter than ``input_len`` are zero-padded at load with start 0,
  reproducing the reference's pad branch (train.py:127-135)

Memory: 4 float32 planes of (S, F, T_max).  MUSDB18-scale (100 songs x
~2560 frames x 512 bins) is ~2.1 GB — comfortably HBM-resident on one v5e
next to the model; ``resident_bytes`` lets callers gate on a cap first.
"""

from __future__ import annotations

import functools
from typing import Dict, Iterator, Optional

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from svs_tpu.data.dataset import PatchDataset, PLANE_KEYS

_KEYS = PLANE_KEYS


def resident_bytes(ds: PatchDataset) -> int:
    """HBM footprint of ``DeviceDataset(ds)`` WITHOUT loading anything:
    4 float32 planes of (n_songs, F, max(T_max, input_len)) — song shapes
    come from .npy headers only (mmap)."""
    lens = [ds.song_length(i) for i in range(ds.n_songs)]
    t_max = max(max(lens), ds.input_len)
    rows = int(ds._song_arrays(ds.file_names[0])[0].shape[0])
    f = rows - (1 if ds.drop_dc else 0)
    return 4 * ds.n_songs * f * t_max * 4


def gather_crops(planes: Dict[str, jax.Array], songs: jax.Array,
                 starts: jax.Array, input_len: int) -> Dict[str, jax.Array]:
    """(B,) song indices + (B,) crop offsets -> dict of (B, F, L) crops,
    entirely on-device (one dynamic_slice per example per plane; XLA lowers
    the batch to a dynamic gather — no host traffic).  Pure/traceable: the
    epoch-scan path (``train/scan.py``) inlines it in a scan body."""
    def one(i, s):
        return {
            k: lax.dynamic_slice(p, (i, 0, s),
                                 (1, p.shape[1], input_len))[0]
            for k, p in planes.items()
        }
    return jax.vmap(one)(songs, starts)


_gather = jax.jit(gather_crops, static_argnames=("input_len",))


def _gather_weighted(planes: Dict[str, jax.Array], songs: jax.Array,
                     starts: jax.Array, weight: jax.Array,
                     input_len: int) -> Dict[str, jax.Array]:
    """Mesh variant of :func:`_gather`: rows are multiplied by the 0/1
    ``weight`` validity vector so padded rows are EXACTLY the zero planes
    the host distributor (``mesh.shard_batch``) appends — x*1.0 is the
    identity and x*0.0 (+0.0 sums) is exact in IEEE, so the weighted step
    reductions match the host pipeline bit-for-bit.  The ``weight`` key
    rides along like the host distributors attach it."""
    out = gather_crops(planes, songs, starts, input_len=input_len)
    out = {k: v * weight[:, None, None] for k, v in out.items()}
    out["weight"] = weight
    return out


class DeviceDataset:
    """HBM-resident mirror of a :class:`PatchDataset`.

    Same ``batches`` signature/semantics as the host dataset; yields dicts
    of committed device arrays instead of numpy.  Intended for single-host
    training where the host->device link is the epoch bottleneck (the
    ``fit()`` integration gates on process count and a byte cap).

    ``mesh``: DP/TP mode — planes are replicated over the mesh and each
    gathered batch comes out batch-sharded on ``axis_name``
    (``out_shardings``) with the ``mesh.shard_batch`` padding policy (zero
    rows to a data-axis-size multiple + 0/1 ``weight``), so batches feed
    ``dp.make_dp_train_step`` — or, on a 2-D ``(data, model)`` mesh,
    ``tp.make_tp_train_step`` (whose batch sharding is the same
    ``P("data")``) — directly: per-step host traffic is still just the two
    (B,) index vectors.

    ``time_sharded`` (with ``mesh``): CP mode — batches come out with the
    TIME axis sharded and a replicated all-ones ``weight``, exactly
    ``halo.shard_batch_time``'s layout, so they feed
    ``halo.make_cp_train_step`` with no host hop and no dev0 bounce.
    """

    def __init__(self, host: PatchDataset, mesh=None, axis_name: str = "data",
                 time_sharded: bool = False):
        self.host = host
        self.mesh = mesh
        self.axis_name = axis_name
        self.time_sharded = bool(time_sharded)
        # validate BEFORE _pack_planes: the loud config error must not cost
        # a full-dataset host-RAM pack first
        if time_sharded:
            if mesh is None:
                raise ValueError("time_sharded requires a mesh")
            n = int(mesh.devices.size)
            if host.input_len % (64 * n):
                raise ValueError(
                    f"time_sharded: input_len {host.input_len} must be a "
                    f"multiple of {64 * n} (64 frames per stride-2 level "
                    f"x {n} shards — halo.shard_batch_time's constraint)")
        planes = _pack_planes(host)
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from svs_tpu.parallel import mesh as mesh_lib
            rep = mesh_lib.replicated(mesh)
            self.planes = {k: jax.device_put(v, rep)
                           for k, v in planes.items()}
            if time_sharded:
                tsh = NamedSharding(mesh, P(None, None, axis_name))
                out_sh = {k: tsh for k in _KEYS}
                out_sh["weight"] = rep
            else:
                out_sh = mesh_lib.batch_sharded(mesh, axis_name)
            self._gather_mesh = jax.jit(
                functools.partial(_gather_weighted,
                                  input_len=host.input_len),
                out_shardings=out_sh)
        else:
            self.planes = {k: jax.device_put(v) for k, v in planes.items()}
        self.nbytes = sum(int(v.nbytes) for v in self.planes.values())

    # -- PatchDataset surface used by the training loop -------------------
    def __len__(self) -> int:
        return len(self.host)

    @property
    def n_songs(self) -> int:
        return self.host.n_songs

    @property
    def input_len(self) -> int:
        return self.host.input_len

    def steps_per_epoch(self, batch_size: int,
                        drop_last: bool = False) -> int:
        return self.host.steps_per_epoch(batch_size, drop_last)

    def gather(self, songs: np.ndarray, starts: np.ndarray
               ) -> Dict[str, jax.Array]:
        """One ad-hoc gathered batch at explicit (song, start) indices
        (mesh-free mode; the epoch-scan path uses this for the ragged tail
        batch)."""
        assert self.mesh is None
        return _gather(self.planes, jnp.asarray(songs, jnp.int32),
                       jnp.asarray(starts, jnp.int32),
                       input_len=self.input_len)

    def gather_mesh(self, songs: np.ndarray, starts: np.ndarray,
                    pad_rows_to: Optional[int] = None
                    ) -> Dict[str, jax.Array]:
        """Mesh-mode companion of :meth:`gather`: one batch-sharded,
        zero-weight-padded batch at explicit indices — the same padding
        policy as :meth:`batches` (which delegates here), used by the
        DP-mesh epoch-scan path for the ragged tail batch."""
        assert self.mesh is not None and not self.time_sharded
        songs = np.asarray(songs, np.int32)
        starts = np.asarray(starts, np.int32)
        b = len(songs)
        # pad to the batch-sharding axis's size (== device count on the
        # 1-D DP mesh; the "data" dimension only on a 2-D (data, model)
        # TP mesh) — mirrors mesh.shard_batch's padding policy exactly
        n_dev = int(self.mesh.shape[self.axis_name])
        padded = -(-max(b, pad_rows_to or 0) // n_dev) * n_dev
        weight = np.zeros(padded, np.float32)
        weight[:b] = 1.0
        # pad indices with (song 0, start 0): the gathered rows are
        # zeroed by the in-kernel weight multiply, matching the host
        # distributor's appended zero rows exactly
        songs = np.pad(songs, (0, padded - b))
        starts = np.pad(starts, (0, padded - b))
        return self._gather_mesh(self.planes, jnp.asarray(songs),
                                 jnp.asarray(starts), jnp.asarray(weight))

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: Optional[int] = None,
        drop_last: bool = False,
        prefetch: int = 2,  # unused: device dispatch is already async
        n_steps: Optional[int] = None,
        pad_rows_to: Optional[int] = None,
    ) -> Iterator[Dict[str, jax.Array]]:
        """``pad_rows_to`` (mesh mode only): fixed row target — pass the
        full batch size for validation so the remainder batch keeps the
        full-batch shape and eval compiles ONE signature (the
        ``multihost.global_batch_from_global`` convention).  Default pads
        only up to the device-count multiple (``mesh.shard_batch``)."""
        n_songs = self.host.n_songs
        for idxs, starts in self.host.index_batches(
                batch_size, shuffle=shuffle, seed=seed,
                drop_last=drop_last, n_steps=n_steps):
            songs = np.asarray(idxs, np.int32) % n_songs
            starts = starts.astype(np.int32)
            if self.mesh is None:
                yield _gather(self.planes, jnp.asarray(songs),
                              jnp.asarray(starts), self.input_len)
                continue
            b = len(songs)
            if self.time_sharded:  # CP: whole batch, all-ones weight
                yield self._gather_mesh(self.planes, jnp.asarray(songs),
                                        jnp.asarray(starts),
                                        jnp.ones(b, jnp.float32))
                continue
            yield self.gather_mesh(songs, starts, pad_rows_to=pad_rows_to)


def _pack_planes(host: PatchDataset) -> Dict[str, np.ndarray]:
    """The (S, F, T_max) float32 plane boxes shared by both resident
    datasets: magnitudes straight from the mmaps, angles from the host's
    once-per-song cache (the single shared angle computation — see
    ``PatchDataset._song_angles``), short songs zero-padded."""
    lo = 1 if host.drop_dc else 0
    lens = [host.song_length(i) for i in range(host.n_songs)]
    t_max = max(max(lens), host.input_len)
    rows = int(host._song_arrays(host.file_names[0])[0].shape[0])
    planes = {k: np.zeros((host.n_songs, rows - lo, t_max), np.float32)
              for k in _KEYS}
    for s, name in enumerate(host.file_names):
        mix_m, voc_m, _, _ = host._song_arrays(name)
        t = mix_m.shape[1]
        planes["mix"][s, :, :t] = mix_m[lo:]
        planes["voc"][s, :, :t] = voc_m[lo:]
        mix_a, voc_a = host._song_angles(name)
        planes["mix_angle"][s, :, :t] = mix_a
        planes["voc_angle"][s, :, :t] = voc_a
    # release the host-side per-song angle cache (~10 MB/song): the
    # resident planes now hold those values, and any later host-pipeline
    # use just recomputes identical entries (np.angle is deterministic)
    host._angles.clear()
    return planes


class MultiHostDeviceDataset:
    """Device-resident training data for multi-host (DCN) DP jobs.

    Each host's song shard (``fit()`` already split the songs with
    ``multihost.process_shard``) is committed to EVERY one of its data-axis
    devices; each step gathers that device's quota of crops locally and the
    per-device shards are assembled into one globally-sharded batch with
    ``jax.make_array_from_single_device_arrays`` — the device-resident
    mirror of ``multihost.global_batch_from_local(pad_to=...)``, down to
    the zero rows + 0/1 ``weight`` padding (pad rows are zeroed in-kernel
    by the weight multiply).  Per-step DCN/host traffic: two (B_local,)
    int32 vectors per host.  No collective touches the data path, so hosts
    stay in lockstep exactly as with the host pipeline.

    HBM cost: the host's local planes are replicated on each of its
    ``local_quota`` devices (each device needs random access to every local
    song).  The ``fit()`` gate caps the PER-DEVICE footprint.
    """

    def __init__(self, host: PatchDataset, mesh, pad_to: int,
                 axis_name: str = "data"):
        from svs_tpu.parallel import mesh as mesh_lib, multihost

        self.host = host
        self.mesh = mesh
        self.axis_name = axis_name
        self.pad_to = int(pad_to)
        lq = multihost.local_quota(mesh, axis_name)
        if self.pad_to % lq:
            raise ValueError(f"pad_to={pad_to} not a multiple of this "
                             f"host's data-axis quota {lq}")
        self.quota = self.pad_to // lq
        self.global_rows = self.pad_to * jax.process_count()
        self._sharding = mesh_lib.batch_sharded(mesh, axis_name)
        # addressable data-axis devices ordered by the global row ranges
        # they own under P(axis_name) — local row chunk i feeds device i,
        # reproducing make_array_from_process_local_data's placement
        imap = self._sharding.addressable_devices_indices_map(
            (self.global_rows,))
        self.local_devices = sorted(
            imap, key=lambda d: imap[d][0].indices(self.global_rows)[0])
        planes = _pack_planes(host)
        self.planes_per_dev = [
            {k: jax.device_put(v, d) for k, v in planes.items()}
            for d in self.local_devices
        ]
        per_dev = sum(int(v.nbytes) for v in planes.values())
        self.nbytes = per_dev * len(self.local_devices)
        self.nbytes_per_device = per_dev
        self._gather = jax.jit(functools.partial(
            _gather_weighted, input_len=host.input_len))

    def __len__(self) -> int:
        return len(self.host)

    @property
    def input_len(self) -> int:
        return self.host.input_len

    def steps_per_epoch(self, batch_size: int,
                        drop_last: bool = False) -> int:
        return self.host.steps_per_epoch(batch_size, drop_last)

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        seed: Optional[int] = None,
        drop_last: bool = False,
        prefetch: int = 2,  # unused
        n_steps: Optional[int] = None,
    ) -> Iterator[Dict[str, jax.Array]]:
        if batch_size > self.pad_to:
            raise ValueError(f"local batch {batch_size} > pad_to "
                             f"{self.pad_to}")
        n_songs = self.host.n_songs
        q = self.quota
        item = next(iter(self.planes_per_dev[0].values())).shape[1:2] \
            + (self.input_len,)
        for idxs, starts in self.host.index_batches(
                batch_size, shuffle=shuffle, seed=seed,
                drop_last=drop_last, n_steps=n_steps):
            b = len(idxs)
            songs = np.zeros(self.pad_to, np.int32)
            songs[:b] = np.asarray(idxs, np.int32) % n_songs
            st = np.zeros(self.pad_to, np.int32)
            st[:b] = starts.astype(np.int32)
            weight = np.zeros(self.pad_to, np.float32)
            weight[:b] = 1.0
            shards = []
            for i, dev in enumerate(self.local_devices):
                sl = slice(i * q, (i + 1) * q)
                shards.append(self._gather(
                    self.planes_per_dev[i],
                    jax.device_put(songs[sl], dev),
                    jax.device_put(st[sl], dev),
                    jax.device_put(weight[sl], dev)))
            out = {}
            for k in _KEYS:
                out[k] = jax.make_array_from_single_device_arrays(
                    (self.global_rows,) + item, self._sharding,
                    [s[k] for s in shards])
            out["weight"] = jax.make_array_from_single_device_arrays(
                (self.global_rows,), self._sharding,
                [s["weight"] for s in shards])
            yield out


def epoch_index_arrays(ds: PatchDataset, batch_size: int, *,
                       shuffle: bool = True, seed=None,
                       drop_last: bool = False, n_steps=None):
    """The epoch's index stream as stacked ``(n_full, B)`` int32 arrays of
    (song, start) pairs, plus the ragged tail batch (or None) — the input
    layout of the epoch-scan path (one ``lax.scan`` over all the full
    batches; the tail reuses the per-step program).  Same single RNG
    sequence as every other backend (``index_batches``)."""
    n_songs = ds.n_songs
    songs_l, starts_l, tail = [], [], None
    for idxs, starts in ds.index_batches(batch_size, shuffle=shuffle,
                                         seed=seed, drop_last=drop_last,
                                         n_steps=n_steps):
        if len(idxs) == batch_size:
            songs_l.append(np.asarray(idxs, np.int32) % n_songs)
            starts_l.append(starts.astype(np.int32))
        else:  # only ever the final remainder batch
            tail = (np.asarray(idxs, np.int32) % n_songs,
                    starts.astype(np.int32))
    songs = (np.stack(songs_l) if songs_l
             else np.zeros((0, batch_size), np.int32))
    starts = (np.stack(starts_l) if starts_l
              else np.zeros((0, batch_size), np.int32))
    return songs, starts, tail


def maybe_device_dataset(ds: Optional[PatchDataset], mode: str,
                         cap_mb: float, mesh=None,
                         time_sharded: bool = False) -> Optional[object]:
    """Gate for the fit() integration: returns a DeviceDataset when
    ``mode`` is "on", or "auto" and the resident footprint fits ``cap_mb``;
    otherwise the host dataset unchanged.  ("off" -> host dataset.)"""
    if ds is None or mode == "off":
        return ds
    if mode not in ("on", "auto"):
        raise ValueError(f"device_data must be on/off/auto, got {mode!r}")
    if mode == "auto" and resident_bytes(ds) > cap_mb * 2**20:
        return ds
    return DeviceDataset(ds, mesh=mesh, time_sharded=time_sharded)
