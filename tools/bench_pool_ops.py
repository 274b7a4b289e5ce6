"""Microbenchmarks for the per-particle map-pool hot ops.

The streaming SLAM profile shows the mapping branch dominated by the
merge's pool gathers/scatters (~150 ms/frame at 4096 particles).  This
times the candidate formulations in isolation on the real chip so the
pool data layout is chosen from measurements:

  a) scalar-index gather/scatter, 6 separate field arrays (current)
  b) packed single array, scalar-index gather/scatter
  c) packed rank-3 [B, ncells, C] row gather/scatter (advanced indexing)
  d) packed flat [B, S*C] slice gather/scatter (lax.gather slice_sizes)

Run:  python tools/bench_pool_ops.py [--particles 4096] [--rays 64]
"""

import argparse
import functools
import time


def bench(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    out = fn(*args)
    jax.block_until_ready(out)
    dt = time.time() - t0
    return dt / iters * 1e3  # ms per inner iteration


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=4096)
    ap.add_argument("--rays", type=int, default=64)
    ap.add_argument("--ncells", type=int, default=1600)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--fields", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    n, p, nc, k, nf = (args.particles, args.rays, args.ncells, args.k,
                       args.fields)
    b = n + 64
    m = n * p
    it = args.iters
    key = jax.random.PRNGKey(0)
    blk = jax.random.randint(key, (m,), 0, n)
    cell = jax.random.randint(jax.random.PRNGKey(1), (m,), 0, nc)
    vals = jax.random.normal(jax.random.PRNGKey(2), (m, k))
    valsC = jax.random.normal(jax.random.PRNGKey(3), (m, k * nf))

    def loop(body, *xs):
        @jax.jit
        def run(*xs):
            def one(c, _):
                r = body(*c)
                return (r if isinstance(r, tuple) else (r,)), None
            out, _ = jax.lax.scan(one, xs, None, length=it)
            return out
        return run

    results = {}

    # ---- a) six scalar-index field arrays ----------------------------
    fields = [jnp.zeros((b, nc * k)) for _ in range(nf)]
    idx = cell[:, None] * k + jnp.arange(k)

    def a_gather(*fs):
        out = [f + 0.0 for f in fs]
        acc = 0.0
        for f in fs:
            acc = acc + f[blk[:, None], idx]
        # fold the gathered value back so nothing is DCE'd
        out[0] = out[0].at[blk[:, None], idx].add(acc * 1e-9)
        return tuple(out)

    def a_scatter(*fs):
        return tuple(f.at[blk[:, None], idx].set(vals) for f in fs)

    def a_both(*fs):
        acc = [f[blk[:, None], idx] for f in fs]
        return tuple(
            f.at[blk[:, None], idx].set(a + 1.0)
            for f, a in zip(fs, acc)
        )

    results["a_gather6"] = bench(loop(a_gather), *fields, iters=it)
    results["a_scatter6"] = bench(loop(a_scatter), *fields, iters=it)
    results["a_both6"] = bench(loop(a_both), *fields, iters=it)

    # ---- b) one packed array, scalar indices -------------------------
    packed_flat = jnp.zeros((b, nc * k * nf))
    idxC = cell[:, None] * (k * nf) + jnp.arange(k * nf)

    def b_both(f):
        acc = f[blk[:, None], idxC]
        return f.at[blk[:, None], idxC].set(acc + 1.0)

    results["b_both_packed_scalar"] = bench(
        loop(b_both), packed_flat, iters=it
    )

    # ---- c) packed rank-3 row gather/scatter -------------------------
    packed3 = jnp.zeros((b, nc, k * nf))

    def c_both(f):
        acc = f[blk, cell]                     # [M, K*F] row gather
        return f.at[blk, cell].set(acc + 1.0)

    results["c_both_rank3_rows"] = bench(loop(c_both), packed3, iters=it)

    # ---- d) flat + lax.gather slice rows ------------------------------
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    starts = jnp.stack([blk, cell * (k * nf)], axis=1)

    sdnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,), inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0, 1),
    )

    def d_both(f):
        rows = jax.lax.gather(
            f, starts, dnums, slice_sizes=(1, k * nf),
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
        )                                       # [M, K*F]
        return jax.lax.scatter(
            f, starts, rows + 1.0, sdnums,
            mode=jax.lax.GatherScatterMode.PROMISE_IN_BOUNDS,
            unique_indices=True,
        )

    results["d_both_flat_slices"] = bench(
        loop(d_both), packed_flat, iters=it
    )

    # ---- reference points ---------------------------------------------
    def copy_pool(*fs):
        return tuple(f * 1.000001 for f in fs)

    results["pool_copy6"] = bench(loop(copy_pool), *fields, iters=it)

    print(f"# {n} particles x {p} rays = {m} entries; pool "
          f"[{b}, {nc} cells, {k} slots], {nf} fields; "
          f"{jax.devices()[0].platform}")
    for name, ms in results.items():
        per_elem = ms * 1e6 / m  # ns per (row) entry
        print(f"{name:26s} {ms:8.3f} ms   ({per_elem:7.2f} ns/entry)")


if __name__ == "__main__":
    main()
