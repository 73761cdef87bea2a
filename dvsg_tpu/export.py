"""AOT export of the stabilization device program (``jax.export``).

The reference has no deployment story beyond running its entry scripts
(SURVEY.md §1 L7; reference mount empty — file:line unavailable). The
TPU-native rebuild gets a real one: the whole per-chunk device program
(matrix-form resize → CNN forward → fused warp+quantize) is serialized
as a StableHLO artifact with the trained weights baked in as constants,
so a serving host can run it with ``jax.export.deserialize`` alone — no
model code, no checkpoint files, no Python-side config on the hot path.

Artifact layout (single file)::

    b"DVSGX1\\n" | u32 header_len | header JSON (utf-8) | exported bytes

The JSON header records the pipeline config, input shapes/dtypes, the
export platforms, and the artifact's calling convention, and is
validated at load time. The exported callable is exactly
``pipeline.stabilize.stabilize_chunk_impl`` closed over (cfg, params):

    (frames_u8 (T, H, W, C), halo (window-1, mh, mw, C) f32)
      -> (stabilized_u8 (T, H, W, C), new_halo, offsets (T, gh, gw, 2))

With ``cfg.path_smooth > 0`` the artifact bakes the path-smoothing
stage and its state slot into the I/O signature — state-in → state-out,
exactly like the halo (``stabilize_chunk_smooth_impl``):

    (frames_u8, halo, smooth_state (4,) f32)
      -> (stabilized_u8, new_halo, new_smooth_state, offsets)

so a deployed ``.dvsgx`` ships the full quality feature; the loaded
engine threads the state across chunks and streams like the live
pipeline (byte-identical, tests/test_export.py).

Cross-platform: pass ``platforms=("tpu",)`` on a CPU host to lower for a
TPU serving fleet (XLA's ahead-of-time path; the Pallas warp kernel
serializes as a ``tpu_custom_call`` — its ABI is tied to the libtpu
generation, so the header records the jax version and loaders should
re-export on major upgrades; that caveat is jax.export's own custom-call
stability contract).
"""

from __future__ import annotations

import json
import struct
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from dvsg_tpu.config import (StabilizeConfig, config_to_json,
                             stabilize_config_from_dict)

_MAGIC = b"DVSGX1\n"
_FORMAT_VERSION = 1


def resolve_cfg_platforms(cfg: StabilizeConfig,
                          platforms: Optional[Sequence[str]]
                          ) -> StabilizeConfig:
    """Resolve ``warp_impl="auto"`` against the TARGET platforms.

    ``auto`` normally resolves against the build host's backend
    (ops/warp.resolve_impl) — but an export destined for another
    platform must bake the impl the ARTIFACT will run on: cross-
    exporting from a CPU build host for a TPU fleet has to ship the
    Pallas kernel, not the lax oracle it would silently trace on the
    host (~100x slower in the batched serving context, ops/guard.py).
    """
    if cfg.warp_impl != "auto" or not platforms:
        return cfg
    impl = ("pallas" if any(p in ("tpu", "axon") for p in platforms)
            else "lax")
    return cfg.replace(warp_impl=impl)


def _halo_shape(cfg: StabilizeConfig) -> Tuple[int, int, int, int]:
    mh, mw = cfg.model.model_size
    return (cfg.model.window - 1, mh, mw, cfg.model.channels)


def export_chunk_program(cfg: StabilizeConfig, params, height: int,
                         width: int,
                         platforms: Optional[Sequence[str]] = None):
    """Export the jitted chunk program with ``params`` baked in.

    Returns a ``jax.export.Exported``. ``platforms`` defaults to the
    current backend; pass e.g. ``("tpu",)`` to cross-lower from a CPU
    host for TPU deployment.
    """
    import jax
    from jax import export as jexport

    from dvsg_tpu.ops import warp as warp_ops
    from dvsg_tpu.pipeline import pathsmooth
    from dvsg_tpu.pipeline.stabilize import (stabilize_chunk_impl,
                                             stabilize_chunk_smooth_impl)

    pathsmooth.lag_reject(
        cfg, "AOT export (the artifact signature has no shifted-"
             "emission slot; export the causal smoother instead)")
    plats = tuple(platforms) if platforms else None
    cfg = resolve_cfg_platforms(cfg, plats)

    frames_spec = jax.ShapeDtypeStruct(
        (cfg.chunk_frames, height, width, cfg.model.channels), np.uint8)
    halo_spec = jax.ShapeDtypeStruct(_halo_shape(cfg), np.float32)
    if cfg.path_smooth > 0:
        # Bake the smoothing stage in: the state rides the signature
        # like the halo (state-in → state-out), so the deployed artifact
        # ships the full quality feature (VERDICT round-4 item 2).
        def fn(frames_u8, halo, smooth_state):
            return stabilize_chunk_smooth_impl(cfg, params, frames_u8,
                                               halo, smooth_state)
        specs = (frames_spec, halo_spec,
                 jax.ShapeDtypeStruct((pathsmooth.STATE_DIM,),
                                      np.float32))
    else:
        def fn(frames_u8, halo):
            return stabilize_chunk_impl(cfg, params, frames_u8, halo)
        specs = (frames_spec, halo_spec)
    disabled = ()
    if warp_ops.resolve_impl(cfg.warp_impl) != "lax":
        # The Pallas kernel lowers to a tpu_custom_call, which jax.export
        # flags as non-guaranteed-stable; we accept that (the header
        # records the jax version for re-export policies).
        disabled = (jexport.DisabledSafetyCheck.custom_call(
            "tpu_custom_call"),)
    return jexport.export(jax.jit(fn), platforms=plats,
                          disabled_checks=list(disabled))(*specs)


def export_batch_program(cfg: StabilizeConfig, params, n_clips: int,
                         height: int, width: int, mesh,
                         platforms: Optional[Sequence[str]] = None):
    """Export the mesh-sharded multi-clip chunk program (config 4/5).

    The per-clip data-parallel program of ``parallel.dp`` — clips sharded
    over the mesh's data axis, params baked in as (replicated) constants.
    The artifact records the device count; deserializing requires a
    process with at least that many devices (jax.export's sharded calling
    convention).
    """
    import jax
    from jax import export as jexport
    from jax.sharding import NamedSharding, PartitionSpec as P

    from dvsg_tpu.ops import warp as warp_ops
    from dvsg_tpu.parallel.dp import (_stabilize_chunk_batch,
                                      _stabilize_chunk_batch_smooth)
    from dvsg_tpu.parallel.mesh import DATA_AXIS
    from dvsg_tpu.pipeline import pathsmooth

    pathsmooth.lag_reject(cfg, "AOT batch export")
    cfg = resolve_cfg_platforms(
        cfg, tuple(platforms) if platforms else None)
    shard = NamedSharding(mesh, P(DATA_AXIS))

    frames_spec = jax.ShapeDtypeStruct(
        (n_clips, cfg.chunk_frames, height, width, cfg.model.channels),
        np.uint8)
    halos_spec = jax.ShapeDtypeStruct((n_clips,) + _halo_shape(cfg),
                                      np.float32)
    if cfg.path_smooth > 0:
        # Per-clip (B, STATE_DIM) smoothing states ride the vmap and the
        # clip sharding, exactly like the live sharded program.
        fn = jax.jit(
            lambda frames, halos, states: _stabilize_chunk_batch_smooth(
                cfg, params, frames, halos, states),
            in_shardings=(shard, shard, shard),
            out_shardings=(shard, shard, shard, shard))
        specs = (frames_spec, halos_spec,
                 jax.ShapeDtypeStruct((n_clips, pathsmooth.STATE_DIM),
                                      np.float32))
    else:
        fn = jax.jit(
            lambda frames, halos: _stabilize_chunk_batch(cfg, params,
                                                         frames, halos),
            in_shardings=(shard, shard),
            out_shardings=(shard, shard, shard))
        specs = (frames_spec, halos_spec)
    disabled = ()
    if warp_ops.resolve_impl(cfg.warp_impl) != "lax":
        disabled = (jexport.DisabledSafetyCheck.custom_call(
            "tpu_custom_call"),)
    plats = tuple(platforms) if platforms else None
    return jexport.export(fn, platforms=plats,
                          disabled_checks=list(disabled))(*specs)


def save_exported(exp, path: str, cfg: StabilizeConfig,
                  extra: Optional[Dict[str, Any]] = None) -> None:
    """Write the artifact file (magic | header | serialized program)."""
    import jax

    header = {
        "format": "dvsgx",
        "version": 1,
        "jax_version": jax.__version__,
        "platforms": list(exp.platforms),
        "config": json.loads(config_to_json(cfg)),
        "in_avals": [[list(a.shape), str(a.dtype)]
                     for a in exp.in_avals],
        "out_avals": [[list(a.shape), str(a.dtype)]
                      for a in exp.out_avals],
        "nr_devices": exp.nr_devices,
    }
    if extra:
        header.update(extra)
    hdr = json.dumps(header, sort_keys=True).encode("utf-8")
    blob = exp.serialize()
    with open(path, "wb") as f:
        f.write(_MAGIC)
        f.write(struct.pack("<I", len(hdr)))
        f.write(hdr)
        f.write(blob)


class ExportedStabilizer:
    """A loaded artifact: the Stabilizer API without model code.

    ``chunk`` is the raw exported step; ``stabilize_clip`` mirrors
    ``pipeline.stabilize.Stabilizer.stabilize_clip`` (chunk loop, halo
    carry, tail padding) for whole in-memory clips.
    """

    def __init__(self, exported, meta: Dict[str, Any]):
        self._exported = exported
        self.meta = meta
        self.cfg = stabilize_config_from_dict(meta["config"])
        self.smooth = self.cfg.path_smooth > 0
        shape, _ = meta["in_avals"][0]
        self.batched = len(shape) == 5
        if self.batched:
            (self.n_clips, self.chunk_frames, self.height, self.width,
             self.channels) = shape
        else:
            self.n_clips = None
            self.chunk_frames, self.height, self.width, self.channels = \
                shape

    def chunk(self, frames_u8, halo, smooth_state=None):
        """The raw exported step. A smoothed artifact
        (``self.smooth``) takes and returns the extra state:
        (out, new_halo, new_state, offsets) vs (out, new_halo, offsets).
        """
        if self.smooth:
            if smooth_state is None:
                raise ValueError(
                    "this artifact was exported with path_smooth="
                    f"{self.cfg.path_smooth}: chunk() needs the carried "
                    "smooth_state (pathsmooth.initial_state() at stream "
                    "start)")
            return self._call()(frames_u8, halo, smooth_state)
        return self._call()(frames_u8, halo)

    def _call(self):
        """The callable for the exported program.

        A sharded (batched) export must be invoked from a jit spanning
        the same number of devices it was exported for; wrap it once in
        a jit with the clip axis sharded over a data mesh (the same
        shardings ``parallel.dp.make_sharded_chunk_fn`` uses)."""
        if getattr(self, "_call_fn", None) is not None:
            return self._call_fn
        if not self.batched:
            self._call_fn = self._exported.call
            return self._call_fn
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        from dvsg_tpu.parallel.mesh import DATA_AXIS, make_mesh

        need = int(self.meta.get("nr_devices", 1))
        if len(jax.devices()) < need:
            raise ValueError(
                f"batched artifact needs {need} devices; this process "
                f"has {len(jax.devices())}")
        mesh = make_mesh((need,))
        shard = NamedSharding(mesh, P(DATA_AXIS))
        n_in = 3 if self.smooth else 2
        self._call_fn = jax.jit(self._exported.call,
                                in_shardings=(shard,) * n_in,
                                out_shardings=(shard,) * (n_in + 1))
        return self._call_fn

    def engine(self):
        """A ``pipeline.Stabilizer`` whose device step is the artifact's
        program: every streaming driver (sync with resume, overlapped)
        works unchanged against it. Single-clip artifacts only; the input
        resolution must match the exported one (the fixed-shape program
        rejects anything else)."""
        from dvsg_tpu.pipeline.stabilize import Stabilizer

        if self.batched:
            raise ValueError("batched artifact: engine() needs a "
                             "single-clip export")
        loaded = self

        class _ArtifactStabilizer(Stabilizer):
            def __init__(self):
                super().__init__(loaded.cfg, params=None)

            def _chunk(self, dev_chunk, halo):
                if loaded.smooth:
                    # Thread the baked-in state slot exactly as the live
                    # pipeline's _chunk threads stabilize_chunk_smooth.
                    if self._smooth_state is None:
                        self.begin_stream()
                    out, halo, self._smooth_state, offs = loaded.chunk(
                        dev_chunk, halo, self._smooth_state)
                    return out, halo, offs
                return loaded.chunk(dev_chunk, halo)

        return _ArtifactStabilizer()

    def stabilize_clips(self, clips_u8: np.ndarray) -> np.ndarray:
        """Batched artifacts: (B, T_total, H, W, C) uint8 → stabilized.

        Mirrors ``parallel.dp.ShardedClipStabilizer.stabilize_clips``
        (same drive_chunked_batch loop, so D2H pipelining and tail
        padding behave identically; smoothed artifacts thread per-clip
        states through pathsmooth.thread_batch_state, like the live
        sharded surface)."""
        from dvsg_tpu.pipeline.stabilize import drive_chunked_batch

        if not self.batched:
            raise ValueError("single-clip artifact: use stabilize_clip")
        if clips_u8.shape[0] != self.n_clips:
            raise ValueError(
                f"artifact was exported for {self.n_clips} clips, got "
                f"{clips_u8.shape[0]}")
        if self.smooth:
            from dvsg_tpu.pipeline import pathsmooth
            fn = pathsmooth.thread_batch_state(
                lambda _p, frames, halos, states: self.chunk(
                    frames, halos, states), self.n_clips)
            return drive_chunked_batch(fn, None, self.cfg, clips_u8)
        return drive_chunked_batch(
            lambda _params, frames, halos: self.chunk(frames, halos),
            None, self.cfg, clips_u8)

    def stabilize_clip(self, frames_u8: np.ndarray) -> np.ndarray:
        from dvsg_tpu.pipeline.stabilize import initial_halo

        if self.batched:
            raise ValueError(
                f"batched artifact ({self.n_clips} clips): use "
                "stabilize_clips")
        total = frames_u8.shape[0]
        if total == 0:
            return frames_u8
        if frames_u8.shape[1:] != (self.height, self.width, self.channels):
            raise ValueError(
                f"artifact was exported for frames "
                f"{(self.height, self.width, self.channels)}, got "
                f"{tuple(frames_u8.shape[1:])}")
        halo = initial_halo(self.cfg, frames_u8[0])
        state = None
        if self.smooth:
            from dvsg_tpu.pipeline import pathsmooth
            state = pathsmooth.initial_state()
        t_chunk = self.chunk_frames
        outs = []
        for start in range(0, total, t_chunk):
            chunk = frames_u8[start:start + t_chunk]
            n_valid = chunk.shape[0]
            if n_valid < t_chunk:
                pad = np.repeat(chunk[-1:], t_chunk - n_valid, axis=0)
                chunk = np.concatenate([chunk, pad], axis=0)
            if self.smooth:
                out, halo, state, _ = self.chunk(chunk, halo, state)
            else:
                out, halo, _ = self.chunk(chunk, halo)
            outs.append(np.asarray(out)[:n_valid])
        return np.concatenate(outs, axis=0)


def load_exported(path: str) -> ExportedStabilizer:
    """Read an artifact file, validate its header, deserialize the
    program. Raises ``ValueError`` with an actionable message on a
    truncated file or an unsupported format version; warns (stderr) when
    the artifact was exported under a different jax version (the
    tpu_custom_call ABI caveat in the module docstring)."""
    import sys

    import jax
    from jax import export as jexport

    with open(path, "rb") as f:
        magic = f.read(len(_MAGIC))
        if magic != _MAGIC:
            raise ValueError(f"{path} is not a dvsgx artifact "
                             f"(bad magic {magic!r})")
        raw_len = f.read(4)
        if len(raw_len) < 4:
            raise ValueError(f"{path}: truncated artifact (no header "
                             "length)")
        (hdr_len,) = struct.unpack("<I", raw_len)
        raw_hdr = f.read(hdr_len)
        if len(raw_hdr) < hdr_len:
            raise ValueError(f"{path}: truncated artifact (header cut "
                             f"short at {len(raw_hdr)}/{hdr_len} bytes)")
        meta = json.loads(raw_hdr.decode("utf-8"))
        blob = f.read()
    if meta.get("format") != "dvsgx" or (
            meta.get("version") != _FORMAT_VERSION):
        raise ValueError(
            f"{path}: unsupported artifact format "
            f"{meta.get('format')!r} v{meta.get('version')!r} (this "
            f"loader reads dvsgx v{_FORMAT_VERSION}); re-export with "
            "this version of dvsg-export")
    if not blob:
        raise ValueError(f"{path}: truncated artifact (no program "
                         "bytes after the header)")
    if meta.get("jax_version") != jax.__version__:
        print(f"WARNING: {path} was exported under jax "
              f"{meta.get('jax_version')}, this process runs "
              f"{jax.__version__}; the embedded tpu_custom_call ABI is "
              "not guaranteed stable across versions — re-export if "
              "deserialization or execution fails", file=sys.stderr)
    exported = jexport.deserialize(blob)
    return ExportedStabilizer(exported, meta)
