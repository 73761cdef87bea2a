"""On-chip validation of the AOT export path (dvsg_tpu/export.py).

Exports the production chunk program (fast preset, Pallas warp) for TPU,
round-trips it through the .dvsgx artifact file, executes the
deserialized program on the chip, and compares bit-for-bit against the
live pipeline on the same inputs.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache \
     python scripts/validate_export_tpu.py
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import numpy as np
import jax

from dvsg_tpu import export as export_lib
from dvsg_tpu.config import StabilizeConfig
from dvsg_tpu.pipeline.stabilize import initial_halo, stabilize_chunk_impl
from dvsg_tpu.utils import checkpoint as ckpt


def main():
    print("backend:", jax.default_backend(), flush=True)
    root = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    params, mcfg = ckpt.load_npz(
        os.path.join(root, "checkpoints", "flagship_fast.npz"))
    mcfg = dataclasses.replace(mcfg, dtype="bfloat16")
    cfg = StabilizeConfig(model=mcfg, chunk_frames=8, warp_impl="pallas")
    h, w = 720, 1280

    t0 = time.perf_counter()
    exp = export_lib.export_chunk_program(cfg, params, h, w,
                                          platforms=("tpu",))
    path = "/tmp/flagship_fast_720p.dvsgx"
    export_lib.save_exported(exp, path, cfg)
    print(f"exported+saved in {time.perf_counter() - t0:.1f}s "
          f"({os.path.getsize(path) / 1e6:.1f} MB)", flush=True)

    loaded = export_lib.load_exported(path)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, (8, h, w, 3), dtype=np.uint8)
    halo = initial_halo(cfg, frames[0])

    out_a, halo_a, offs_a = loaded.chunk(frames, halo)
    out_b, halo_b, offs_b = jax.jit(
        lambda p, f, hl: stabilize_chunk_impl(cfg, p, f, hl))(
            params, frames, halo)
    d_out = int(np.max(np.abs(np.asarray(out_a).astype(int)
                              - np.asarray(out_b).astype(int))))
    d_halo = float(np.max(np.abs(np.asarray(halo_a) - np.asarray(halo_b))))
    d_offs = float(np.max(np.abs(np.asarray(offs_a) - np.asarray(offs_b))))
    print(f"artifact vs live on-chip: max|out| {d_out} LSB, "
          f"max|halo| {d_halo:.2e}, max|offsets| {d_offs:.2e}", flush=True)
    ok = d_out == 0 and d_halo == 0.0 and d_offs == 0.0

    # Smoothed artifact (round 5): the state slot rides the signature.
    from dvsg_tpu.pipeline import pathsmooth
    from dvsg_tpu.pipeline.stabilize import stabilize_chunk_smooth_impl
    scfg = cfg.replace(path_smooth=32)
    t0 = time.perf_counter()
    sexp = export_lib.export_chunk_program(scfg, params, h, w,
                                           platforms=("tpu",))
    spath = "/tmp/flagship_fast_720p_smooth.dvsgx"
    export_lib.save_exported(sexp, spath, scfg)
    print(f"smoothed export in {time.perf_counter() - t0:.1f}s", flush=True)
    sloaded = export_lib.load_exported(spath)
    state = pathsmooth.initial_state()
    so_a, sh_a, st_a, sf_a = sloaded.chunk(frames, halo, state)
    so_b, sh_b, st_b, sf_b = jax.jit(
        lambda p, f, hl, st: stabilize_chunk_smooth_impl(scfg, p, f, hl,
                                                         st))(
            params, frames, halo, state)
    sd_out = int(np.max(np.abs(np.asarray(so_a).astype(int)
                               - np.asarray(so_b).astype(int))))
    sd_state = float(np.max(np.abs(np.asarray(st_a) - np.asarray(st_b))))
    print(f"smoothed artifact vs live: max|out| {sd_out} LSB, "
          f"max|state| {sd_state:.2e}", flush=True)
    ok = ok and sd_out == 0 and sd_state == 0.0
    print("PASS" if ok else "MISMATCH", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
