"""Decompose the Pallas merge kernel's ~2 us/block-step cost.

The round-3 SLAM profile puts the block-merge kernel at ~8.7 ms per
mapping frame at 4096 particles (~2.1 us per grid step) while its DMA
traffic (8 x 26 KB) and MXU work are both sub-0.5 us — the cost is
fixed per-step overhead.  Candidate causes, each isolated here by a
stripped kernel sharing the production grid spec:

  merge        production ``merge_blocks`` (baseline)
  copy_all     same operands / aliasing, passthrough body
               -> merge - copy_all   = slot-rule body cost
  copy_fields  4 field operands only, no point operands
               -> copy_all - copy_fields = per-step point-DMA cost
  copy_packed  ONE packed [B, 4*nx, nyk] field operand (in+out)
               -> DMA-issue-count share of the floor
  merge_packed full merge body on the packed operand (+ points)
               -> what production would run at if packing wins

Run:  python tools/probe_merge_overhead.py [--particles 4096] [--cpu]
"""

import argparse
import functools
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=int, default=4096)
    ap.add_argument("--rays", type=int, default=64)
    ap.add_argument("--nx", type=int, default=40)
    ap.add_argument("--ny", type=int, default=40)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument(
        "--only", default="",
        help="comma list of variants to run (merge, copy_all, "
             "copy_fields, copy_packed, merge_packed, grouped4, "
             "grouped8, grouped16); empty = all")
    ap.add_argument(
        "--no-parity", action="store_true",
        help="skip the grouped-vs-production parity check (each "
             "unjitted call is a fresh remote compile on TPU)")
    args = ap.parse_args()
    only = set(filter(None, args.only.split(",")))
    want = lambda name: not only or name in only

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    interpret = jax.default_backend() != "tpu"

    from slam_eslam_tpu.ops import pallas_merge

    n, p, nx, ny, k = args.particles, args.rays, args.nx, args.ny, args.k
    nyk = ny * k
    b = n + 64
    it = args.iters
    rng = np.random.default_rng(0)

    mean = jnp.asarray(rng.normal(size=(b, nx, nyk)).astype(np.float32))
    stdev = jnp.asarray(
        rng.uniform(0.05, 0.3, size=(b, nx, nyk)).astype(np.float32))
    height = jnp.zeros((b, nx, nyk), jnp.float32)
    meta = jnp.asarray(
        (rng.random(size=(b, nx, nyk)) < 0.5).astype(np.int32))
    blk = jnp.asarray(rng.permutation(b)[:n].astype(np.int32))
    lx = jnp.asarray(rng.integers(0, nx, size=(n, p)).astype(np.int32))
    ly = jnp.asarray(rng.integers(0, ny, size=(n, p)).astype(np.int32))
    w = jnp.asarray(
        rng.uniform(1.0, 50.0, size=(n, p)).astype(np.float32))
    wz = jnp.asarray(rng.normal(size=(n, p)).astype(np.float32))

    # packed field image: fields stacked on the SUBLANE axis
    # [B, 4*nx, nyk]; meta rides bitcast-as-f32 rows
    packed = jnp.concatenate(
        [mean, stdev, height,
         jax.lax.bitcast_convert_type(meta, jnp.float32)], axis=1)

    def timeit(fn, *xs):
        def one(c, _):
            r = fn(*c)
            return (r if isinstance(r, tuple) else (r,)), None

        run = jax.jit(
            lambda *xs: jax.lax.scan(one, xs, None, length=it)[0])
        out = jax.block_until_ready(run(*xs))
        t0 = time.time()
        out = jax.block_until_ready(run(*xs))
        dt = (time.time() - t0) / it * 1e3
        return dt

    results = {}

    # ---- baseline: production merge ---------------------------------
    def merge(mean, stdev, height, meta):
        return tuple(pallas_merge.merge_blocks(
            mean, stdev, height, meta, blk, lx, ly, w, wz, 3,
            k=k, interpret=interpret))

    if want("merge"):
        results["merge (production)"] = timeit(merge, mean, stdev,
                                               height, meta)

    # ---- copy_all: same operands, passthrough body ------------------
    def _copy_all_kernel(blk_ref, par_ref, lx_ref, lyt_ref, w_ref,
                         wz_ref, mi, si, hi, gi, mo, so, ho, go):
        del blk_ref, par_ref, lyt_ref, wz_ref
        mo[0] = mi[0]
        so[0] = si[0]
        ho[0] = hi[0]
        # consume the point operands so their DMAs survive DCE
        go[0] = gi[0] + (lx_ref[0, 0, 0] * 0 +
                         w_ref[0, 0, 0].astype(jnp.int32) * 0)

    def make_call(kernel, with_points):
        field_spec = pl.BlockSpec(
            (1, nx, nyk), lambda i, blk, par: (blk[i], 0, 0),
            memory_space=pltpu.VMEM)
        pt_specs = [
            pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p, 1), lambda i, blk, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ] if with_points else []
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2, grid=(n,),
            in_specs=pt_specs + [field_spec] * 4,
            out_specs=[field_spec] * 4)
        nf = len(pt_specs)
        aliases = {2 + nf + j: j for j in range(4)}
        shapes = [jax.ShapeDtypeStruct((b, nx, nyk), jnp.float32)] * 3 \
            + [jax.ShapeDtypeStruct((b, nx, nyk), jnp.int32)]
        return grid_spec, aliases, shapes

    grid_spec, aliases, shapes = make_call(_copy_all_kernel, True)
    params = jnp.asarray([3], jnp.int32)
    lx3 = lx[:, None, :]
    lyt3 = ly[:, :, None]
    w3 = w[:, None, :]
    wz3 = wz[:, None, :]

    def copy_all(mean, stdev, height, meta):
        return tuple(pl.pallas_call(
            _copy_all_kernel, grid_spec=grid_spec, out_shape=shapes,
            input_output_aliases=aliases, interpret=interpret,
        )(blk, params, lx3, lyt3, w3, wz3, mean, stdev, height, meta))

    if want("copy_all"):
        results["copy_all (8 field + 4 pt DMAs)"] = timeit(
            copy_all, mean, stdev, height, meta)

    # ---- copy_fields: field operands only ---------------------------
    def _copy_fields_kernel(blk_ref, par_ref, mi, si, hi, gi,
                            mo, so, ho, go):
        del blk_ref, par_ref
        mo[0] = mi[0]
        so[0] = si[0]
        ho[0] = hi[0]
        go[0] = gi[0]

    gs2, al2, sh2 = make_call(_copy_fields_kernel, False)

    def copy_fields(mean, stdev, height, meta):
        return tuple(pl.pallas_call(
            _copy_fields_kernel, grid_spec=gs2, out_shape=sh2,
            input_output_aliases=al2, interpret=interpret,
        )(blk, params, mean, stdev, height, meta))

    if want("copy_fields"):
        results["copy_fields (8 field DMAs)"] = timeit(
            copy_fields, mean, stdev, height, meta)

    # ---- copy_packed: one packed operand in + out --------------------
    def _copy_packed_kernel(blk_ref, par_ref, pi, po):
        del blk_ref, par_ref
        po[0] = pi[0]

    pk_spec = pl.BlockSpec(
        (1, 4 * nx, nyk), lambda i, blk, par: (blk[i], 0, 0),
        memory_space=pltpu.VMEM)
    gs3 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=[pk_spec], out_specs=[pk_spec])

    def copy_packed(packed):
        return pl.pallas_call(
            _copy_packed_kernel, grid_spec=gs3,
            out_shape=[jax.ShapeDtypeStruct((b, 4 * nx, nyk),
                                            jnp.float32)],
            input_output_aliases={2: 0}, interpret=interpret,
        )(blk, params, packed)[0]

    if want("copy_packed"):
        results["copy_packed (2 field DMAs)"] = timeit(copy_packed,
                                                       packed)

    # ---- merge_packed: full body on the packed operand ---------------
    def _merge_packed_kernel(blk_ref, par_ref, lx_ref, lyt_ref, w_ref,
                             wz_ref, pi, po, *, nx, ny, k,
                             patch_thickness, gap_size):
        del blk_ref
        img = pi[0]
        mean = jax.lax.slice(img, (0, 0), (nx, ny * k))
        stdev = jax.lax.slice(img, (nx, 0), (2 * nx, ny * k))
        height = jax.lax.slice(img, (2 * nx, 0), (3 * nx, ny * k))
        meta = jax.lax.bitcast_convert_type(
            jax.lax.slice(img, (3 * nx, 0), (4 * nx, ny * k)),
            jnp.int32)
        nm, ns, nh, ng = pallas_merge._merge_body(
            par_ref[0], lx_ref[0], lyt_ref[0], w_ref[0], wz_ref[0],
            mean, stdev, height, meta, nx=nx, ny=ny, k=k,
            patch_thickness=patch_thickness, gap_size=gap_size)
        po[0] = jnp.concatenate(
            [nm, ns, nh,
             jax.lax.bitcast_convert_type(ng, jnp.float32)], axis=0)

    pt_specs = [
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, 1), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, p), lambda i, blk, par: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    gs4 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2, grid=(n,),
        in_specs=pt_specs + [pk_spec], out_specs=[pk_spec])

    def merge_packed(packed):
        return pl.pallas_call(
            functools.partial(
                _merge_packed_kernel, nx=nx, ny=ny, k=k,
                patch_thickness=0.1, gap_size=1.5),
            grid_spec=gs4,
            out_shape=[jax.ShapeDtypeStruct((b, 4 * nx, nyk),
                                            jnp.float32)],
            input_output_aliases={6: 0}, interpret=interpret,
        )(blk, params, lx3, lyt3, w3, wz3, packed)[0]

    if hasattr(pallas_merge, "_merge_body") and want("merge_packed"):
        results["merge_packed (2 field DMAs)"] = timeit(
            merge_packed, packed)

    # ---- merge_grouped: the production double-buffered G-block path --
    def make_merge_grouped(g):
        def merge_g(mean, stdev, height, meta):
            return tuple(pallas_merge.merge_blocks_grouped(
                mean, stdev, height, meta, blk, lx, ly, w, wz, 3,
                k=k, group=g, interpret=interpret))
        return merge_g

    # parity: grouped must produce the same map content
    ref = None if args.no_parity else merge(mean, stdev, height, meta)

    for g in (4, 8, 16):
        if n % g or not want(f"grouped{g}"):
            continue
        mgd = make_merge_grouped(g)
        results[f"merge_grouped{g} (dbl-buf DMA)"] = timeit(
            mgd, mean, stdev, height, meta)
        if ref is None:
            continue
        got_d = mgd(mean, stdev, height, meta)
        dmd = float(jnp.max(jnp.abs(ref[0] - got_d[0])))
        dgd = int(jnp.max(jnp.abs(ref[3] - got_d[3])))
        print(f"# parity grouped{g}-vs-production: max|dmean|={dmd} "
              f"max|dmeta|={dgd}")

    print(f"# {n} particles, P={p}, block [{nx},{nyk}] f32, "
          f"{jax.devices()[0].platform}")
    for name, ms in results.items():
        print(f"{name:34s} {ms:8.3f} ms  ({ms * 1e3 / n:6.3f} us/step)")


if __name__ == "__main__":
    main()
