"""Measure ball-query slot occupancy on attack-set-like data (CPU).

VERDICT r3 #4: first-hit padding means slots past a center's hit count
duplicate slot 0, so the grouping kernel + SA MLP pay for rows that can
never change the max-pool. Before building any compaction machinery,
measure how many of the ns slots are actually live per SA level.

Emits one JSON line per (arch, level, radius) with the cnt distribution
(capped at ns — extra hits beyond ns are never materialised).
"""

import json
import sys

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

from geoa3_tpu.data.synthetic import sample_shape
from geoa3_tpu.ops.sampling import furthest_point_sampling, gather_points


def pairwise_cnt(xyz, centers, r):
    d = (
        np.sum(centers**2, -1)[:, :, None]
        + np.sum(xyz**2, -1)[:, None, :]
        - 2 * np.einsum("bmc,bnc->bmn", centers, xyz)
    )
    return (d < r * r).sum(-1)


def main():
    rng = np.random.RandomState(0)
    clouds = np.stack([sample_shape(i % 10, 1024, rng)[0] for i in range(32)])
    import jax.numpy as jnp

    levels = {
        "SSG": [
            (1024, 512, [(0.2, 64)]),
            (512, 128, [(0.4, 64)]),
        ],
        "MSG": [
            (1024, 512, [(0.1, 16), (0.2, 32), (0.4, 128)]),
            (512, 128, [(0.2, 32), (0.4, 64), (0.8, 128)]),
        ],
    }
    xyz = clouds
    # level-1 centers: FPS(1024 -> 512); level-2 centers: FPS(512 -> 128)
    # over the level-1 centers (matching the SA stack)
    x = jnp.asarray(xyz)
    idx1 = furthest_point_sampling(x, 512)
    c1 = np.asarray(gather_points(x, idx1))
    idx2 = furthest_point_sampling(jnp.asarray(c1), 128)
    c2 = np.asarray(gather_points(jnp.asarray(c1), idx2))
    level_data = [(xyz, c1), (c1, c2)]

    for arch, lvls in levels.items():
        for li, (n, m, scales) in enumerate(lvls):
            src, ctr = level_data[li]
            for r, ns in scales:
                cnt = np.minimum(pairwise_cnt(src, ctr, r), ns)
                live = cnt.mean() / ns
                q = np.percentile(cnt, [50, 90, 99, 100])
                print(
                    json.dumps(
                        {
                            "arch": arch,
                            "level": li + 1,
                            "n": n,
                            "m": m,
                            "radius": r,
                            "ns": ns,
                            "mean_live_frac": round(float(live), 4),
                            "cnt_p50": float(q[0]),
                            "cnt_p90": float(q[1]),
                            "cnt_p99": float(q[2]),
                            "cnt_max": float(q[3]),
                            "frac_centers_full": round(
                                float((cnt == ns).mean()), 4
                            ),
                        }
                    ),
                    flush=True,
                )


if __name__ == "__main__":
    main()
