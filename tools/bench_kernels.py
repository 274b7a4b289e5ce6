"""Kernel-level microbenchmarks + speed-of-light accounting.

Measures the two hot kernels on the current backend (BASELINE.md
"per-chip kernel efficiency" row):

* map-lookup: XLA full-grid gather vs the Pallas VMEM-window kernel,
* systematic resampling (cumsum + searchsorted + particle gather),

and reports each against a min-time roofline model (HBM bytes / chip
bandwidth vs FLOPs / chip compute).
"""

import argparse
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def timeit(fn, *args, repeats=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def timeit_chained(f, pts, chain=10, repeats=3):
    """Time ``chain`` dependent applications inside ONE jit dispatch so
    the per-dispatch tunnel overhead (~35-40 ms here) amortises out.
    Returns seconds per single application."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(p):
        def body(carry, _):
            out = f(p + carry)
            return carry + 0.0 * out.ravel()[0], ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=chain)
        return c

    out = run(pts)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(pts))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=2_000_000)
    ap.add_argument("--particles", type=int, default=100_000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--hbm-gbps", type=float, default=819.0)  # v5e
    ap.add_argument("--tflops", type=float, default=197.0)    # v5e bf16
    args = ap.parse_args()

    from slam_eslam_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from slam_eslam_tpu.core import filter as pf
    from slam_eslam_tpu.mapping import mls_grid
    from slam_eslam_tpu.models import sim as simlib
    from slam_eslam_tpu.ops import pallas_gather as pg

    print(f"devices: {jax.devices()}")
    q = args.queries

    terrain = lambda x, y: 0.25 * np.sin(1.3 * np.asarray(x))
    grid = simlib.terrain_grid(
        terrain, nx=400, ny=400, resolution=0.05, origin=(-10.0, -10.0)
    )
    packed = mls_grid.PackedLookup.from_grid(grid)

    key = jax.random.PRNGKey(0)
    pts = jnp.concatenate(
        [
            jax.random.uniform(key, (q, 2), minval=-1.5, maxval=1.5),
            jax.random.uniform(
                jax.random.PRNGKey(1), (q, 1), minval=-0.5, maxval=0.5
            ),
        ],
        axis=1,
    )

    # lookup roofline: useful bytes = Q * 2K * 4 (cells) in + Q * 4 out
    use_bytes = q * (8 * 4 + 4)
    t_ideal_bw = use_bytes / (args.hbm_gbps * 1e9)

    t_gather = timeit_chained(
        lambda p: mls_grid.get_patch_packed(packed, p)[1], pts
    )
    print(f"lookup/gather        : {t_gather * 1e3:8.2f} ms  "
          f"({q / t_gather / 1e6:7.1f} Mq/s)  "
          f"SoL(bw)={t_ideal_bw / t_gather:.3f}")

    for w in (32, 64):
        for tile in (512, 2048):
            t_window = timeit_chained(
                lambda p, w=w, tile=tile: pg.windowed_get_patch(
                    packed, p, window=w, tile=tile
                )[1],
                pts,
            )
            fl = q * (w * (w * 8) * 2)
            t_ideal_fl = fl / (args.tflops * 1e12)
            print(
                f"lookup/win{w:02d}/t{tile:<4d}  : {t_window * 1e3:8.2f} ms  "
                f"({q / t_window / 1e6:7.1f} Mq/s)  "
                f"SoL(bw)={t_ideal_bw / t_window:.3f}  "
                f"SoL(mxu)={t_ideal_fl / t_window:.3f}  "
                f"speedup x{t_gather / t_window:.2f}"
            )

    # fused z-select kernel variant sweep (stage1 x stage2 x window x tile)
    variants = [
        ("onehot", "matmul", 64, 256),
        ("onehot", "matmul", 64, 512),
        ("onehot", "matmul", 64, 1024),
        ("onehot", "matmul", 32, 512),
        ("onehot", "fold", 64, 512),
        ("onehot", "dg", 64, 512),
        ("dg", "matmul", 64, 512),
        ("dg", "dg", 64, 512),
    ]
    for s1, s2, w, tile in variants:
        label = f"fused/{s1}+{s2}/w{w}/t{tile}"
        try:
            t_f = timeit_chained(
                lambda p, s1=s1, s2=s2, w=w, tile=tile:
                    pg.windowed_get_patch_fused(
                        packed, p, window=w, tile=tile,
                        stage1=s1, stage2=s2,
                    )[1],
                pts,
            )
        except Exception as e:  # Mosaic lowering may reject dg paths
            print(f"{label:26s}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]})")
            continue
        print(f"{label:26s}: {t_f * 1e3:8.2f} ms  "
              f"({q / t_f / 1e6:7.1f} Mq/s)  "
              f"SoL(bw)={t_ideal_bw / t_f:.3f}  "
              f"speedup x{t_gather / t_f:.2f}")

    # transposed kernels: layout x window shape x tile
    variants_t = [
        ("q_lanes", 64, 64, 1024, "matmul"),
        ("q_flat", 64, 64, 1024, "matmul"),
        ("q_flat", 64, 64, 2048, "matmul"),
        ("q_flat", 64, 64, 4096, "matmul"),
        ("q_flat", 128, 128, 1024, "matmul"),
        ("q_flat", 128, 128, 2048, "matmul"),
        ("q_flat", 128, 64, 2048, "matmul"),
        ("q_flat", 96, 96, 2048, "matmul"),
        ("q_flat", 64, 64, 1024, "direct"),
        ("q_flat", 64, 64, 2048, "direct"),
        ("q_flat", 128, 64, 2048, "direct"),
        ("q_flat", 128, 32, 2048, "direct"),
        ("q_flat", 96, 96, 2048, "direct"),
        ("q_flat", 128, 96, 2048, "matmul"),
        ("q_flat", 128, 96, 2048, "direct"),
    ]
    for layout, wx, wy, tile, s2 in variants_t:
        label = f"{layout}/{s2}/w{wx}x{wy}/t{tile}"
        try:
            t_f = timeit_chained(
                lambda p, layout=layout, wx=wx, wy=wy, tile=tile, s2=s2:
                    pg.windowed_get_patch_fused(
                        packed, p, window=(wx, wy), tile=tile,
                        layout=layout, stage2=s2,
                    )[1],
                pts,
            )
        except Exception as e:
            print(f"{label:32s}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:90]})")
            continue
        print(f"{label:32s}: {t_f * 1e3:8.2f} ms  "
              f"({q / t_f / 1e6:7.1f} Mq/s)  "
              f"{t_f / q * 1e9:5.2f} ns/q  speedup x{t_gather / t_f:.2f}")

    # resampling
    n = args.particles
    wts = jax.random.uniform(jax.random.PRNGKey(2), (n,)) + 0.01
    state = jax.random.normal(jax.random.PRNGKey(3), (n, 12))

    @jax.jit
    def resample(k, wts, state):
        wn, _ = pf.normalize_weights(wts)
        idx = pf.resample_systematic(k, wn, n)
        return state[idx]

    t_rs = timeit(resample, key, wts, state)
    rs_bytes = n * (12 + 1 + 1) * 4 * 2
    print(f"resample      : {t_rs * 1e3:8.2f} ms  "
          f"({n / t_rs / 1e6:7.1f} Mp/s)  "
          f"SoL(bw)={rs_bytes / (args.hbm_gbps * 1e9) / t_rs:.3f}")


if __name__ == "__main__":
    main()
