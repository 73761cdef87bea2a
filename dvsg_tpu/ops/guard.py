"""vmap-safe contract guard: ``cond(ok, kernel_out, oracle(*args))``.

The warp kernels enforce their stripe-coverage contract with a runtime
predicate and a ``jax.lax.cond`` routing contract-violating inputs to
the exact lax oracle (SURVEY.md §7 stage 2 "fall back when offsets
exceed the band"). That is the right shape for a single clip — but
``jax.vmap``'s batching rule for ``cond`` with a batched predicate
rewrites it to ``select_n``, which EXECUTES BOTH BRANCHES for every
batch member. Every production multi-clip surface (``stabilize-batch``
via pipeline/multiclip.py, parallel/dp.py, the serving batch engine)
vmaps the chunk program over clips, so the naive guard silently ran the
slow gather-based oracle for every clip on every chunk: measured 97×
on the 8-clip 720p batch program (11.9 → ~1100 fps aggregate once
fixed).

``guard_cond`` keeps single-clip semantics identical and installs a
``custom_vmap`` rule for the batched case: reduce the batched predicate
with ``all()``, keep the kernel output when every member satisfies the
contract (the overwhelmingly common case — one cheap scalar reduce),
and only when some member actually violates run the vmapped oracle and
``jnp.where``-repair exactly the violating members.

The rule does NOT support reverse-mode autodiff (custom_vmap
limitation); use it only on inference guards. The differentiable warp
(warp_pallas.bilinear_warp_batch_grids_diff) keeps a plain ``cond``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def guard_cond(ok: jax.Array, out: jax.Array,
               oracle_fn: Callable[..., jax.Array],
               *args: jax.Array) -> jax.Array:
    """``lax.cond(ok, lambda: out, lambda: oracle_fn(*args))`` with a
    batching rule that keeps the oracle branch off the vmapped hot path.

    ``ok`` is the scalar contract predicate, ``out`` the always-computed
    kernel output (keeping the kernel OUTSIDE the cond avoids XLA
    copying its large operands into the branch — see warp_wide), and
    ``oracle_fn(*args)`` the exact fallback producing an array shaped
    and typed like ``out``. ``oracle_fn`` must only close over statics;
    every traced input it needs must be passed via ``*args`` so the
    batching rule sees it.
    """

    @custom_vmap
    def run(ok, out, *args):
        return jax.lax.cond(ok, lambda _: out,
                            lambda _: oracle_fn(*args), None)

    @run.def_vmap
    def _rule(axis_size, in_batched, ok, out, *args):
        ok_b, out_b, *args_b = in_batched

        def bc(x, batched):
            return x if batched else jax.lax.broadcast(x, (axis_size,))

        ok = bc(ok, ok_b)
        out = bc(out, out_b)
        args = tuple(bc(a, b) for a, b in zip(args, args_b))

        def repair(_):
            orc = jax.vmap(oracle_fn)(*args)
            mask = ok.reshape((axis_size,) + (1,) * (out.ndim - 1))
            return jnp.where(mask, out, orc)

        res = jax.lax.cond(jnp.all(ok), lambda _: out, repair, None)
        return res, True

    return run(ok, out, *args)
