"""One-off on-chip re-probe: 720p / 1080p chunk sweep AFTER the exact-fit
row-blocking adoption (pick_n_sub minimal-hop) + UNROLL_QUAD resweep.

The auto-pick table (config.auto_chunk_frames: 720p->32, 1080p->16) was
swept at the old fixed n_sub geometry; the kernel's per-frame cost moved
~-10-14%, so the compute/dispatch balance may have shifted.

Run: JAX_COMPILATION_CACHE_DIR=/root/.jax_cache python scripts/probe_chunk_r3b.py
"""
import sys

sys.path.insert(0, ".")

from probe_chunk_sizes import _load_params, bench_single


def main():
    import jax
    print("backend:", jax.devices()[0].platform, flush=True)
    mcfg, params, name = _load_params()
    print("model:", name, flush=True)

    for t, iters in [(16, 60), (32, 40), (48, 30), (64, 24)]:
        fps, raw = bench_single(mcfg, params, 720, 1280, t, iters)
        print(f"720p T={t}: {fps:.1f} fps (raw {raw:.1f})", flush=True)
    for t, iters in [(8, 60), (16, 40), (32, 24)]:
        fps, raw = bench_single(mcfg, params, 1080, 1920, t, iters)
        print(f"1080p T={t}: {fps:.1f} fps (raw {raw:.1f})", flush=True)


if __name__ == "__main__":
    main()
