"""Derive the default early-termination cap schedule (BackboneConfig.
ray_et_fracs) from realistic scene statistics.

For each synthetic street scene (ground plane + walls/boxes at plausible
depths + open sky) the script computes every camera ray's carried optical
depth sd(s) under the flagship geometry (real frustum, eval-mode rig) and
the Laplace density, then reports, at each early-termination pass boundary,
the fraction of rays that must still be processed:

    demand_j = mean( NOT exited(s_j)  AND  sd(s_j) < tau )

The shipped schedule is the worst case over the scene family + margin, so
any ray the schedule drops carries sd >= tau (remaining transmittance
<= exp(-tau)) unless the scene is far outside this family — which the
sampler's diagnostic counter would surface (rendering.py earlyterm).

Scene family (deliberately termination-hostile):
  * 'open'   — ground only, no obstacles: every above-horizon ray is sky
               and never saturates; ~the worst realistic case.
  * 'suburb' — ground + sparse low boxes.
  * 'urban'  — ground + dense tall walls: most rays terminate early.
  * 'fog'    — uniform low density everywhere + ground (untrained-net-ish).

Run: python scripts/ray_et_study.py  (CPU fine; pure numpy/jax maths)
"""
import sys

sys.path.insert(0, '/root/repo')

import numpy as np


def build_scene(kind, rng, Z, Y, X, zb, yb, xb):
    """Returns an sdf volume (Z, Y, X): negative inside surfaces."""
    # world coords of voxel centers
    zs = zb[0] + (np.arange(Z) + 0.5) * zb[2]
    ys = yb[0] + (np.arange(Y) + 0.5) * yb[2]
    xs = xb[0] + (np.arange(X) + 0.5) * xb[2]
    zg, yg, xg = np.meshgrid(zs, ys, xs, indexing='ij')
    # signed distance to ground plane at z = -1.8 (positive above)
    sdf = zg + 1.8
    if kind == 'open':
        pass
    elif kind in ('suburb', 'urban'):
        n_obj = 25 if kind == 'suburb' else 120
        hmax = 2.5 if kind == 'suburb' else 25.0
        for _ in range(n_obj):
            cx = rng.uniform(xb[0], xb[1])
            cy = rng.uniform(yb[0], yb[1])
            if abs(cx) < 6 and abs(cy) < 6:
                continue  # keep ego clear
            sx = rng.uniform(1.5, 12.0)
            sy = rng.uniform(1.5, 12.0)
            h = rng.uniform(1.0, hmax)
            inside = ((np.abs(xg - cx) < sx / 2)
                      & (np.abs(yg - cy) < sy / 2) & (zg < -1.8 + h))
            # box interior: strongly negative sdf
            sdf = np.where(inside, np.minimum(sdf, -1.0), sdf)
    elif kind == 'fog':
        # uniform slight density: sdf ~ +0.35 everywhere above ground gives
        # laplace density ~ alpha/2 * exp(-1.35/beta) — with beta 0.1 that is
        # ~0; emulate an untrained net's haze with sdf drawn near the bias
        sdf = np.minimum(sdf, rng.uniform(0.5, 3.0, sdf.shape))
    return sdf.astype(np.float32)


def main():
    import jax
    import jax.numpy as jnp
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import geometry as G
    from vampire_tpu.core import rendering as R
    from vampire_tpu.data.synthetic import camera_rig

    cfg = flagship_config()
    c = cfg.backbone
    Z, Y, X = c.grid_zyx('seg')
    frustum = jnp.asarray(G.make_frustum(c.final_dim, c.downsample_factor,
                                         c.d_bound))
    Sn = frustum.shape[0] - 1
    chunk, prefix = c.ray_et_chunk, c.ray_et_prefix
    n_et = -(-Sn // chunk) - prefix
    taus = (5.0, 7.0, 9.0)
    rng = np.random.RandomState(0)

    demand = {t: np.zeros(n_et) for t in taus}
    for seed in (0, 1, 2):
        rig = camera_rig(1, 6, c.final_dim, seed=seed)
        geom = np.asarray(G.get_geometry(
            frustum, jnp.asarray(rig['sensor2ego']), jnp.asarray(rig['intrin']),
            jnp.asarray(rig['ida']), jnp.asarray(rig['bda'])))[0]  # (N,D,h,w,3)
        norm = np.stack([
            (geom[..., 0] - c.x_bound_seg[0]) / (c.x_bound_seg[1] - c.x_bound_seg[0]) * 2 - 1,
            (geom[..., 1] - c.y_bound_seg[0]) / (c.y_bound_seg[1] - c.y_bound_seg[0]) * 2 - 1,
            (geom[..., 2] - c.z_bound_seg[0]) / (c.z_bound_seg[1] - c.z_bound_seg[0]) * 2 - 1,
        ], axis=-1)[:, :-1]                       # (N, Sn, h, w, 3)
        delta = np.linalg.norm(geom[:, 1:] - geom[:, :-1], axis=-1)
        # every 2nd pixel: 1/4 the rays, same per-pass statistics
        norm = norm[:, :, ::2, ::2]
        delta = delta[:, :, ::2, ::2]
        N, _, h, w = delta.shape
        coords = np.moveaxis(norm, 1, 3).reshape(-1, Sn, 3)
        dl = np.moveaxis(delta, 1, 3).reshape(-1, Sn)
        valid = (np.abs(coords) <= 1.0).all(-1)

        for kind in ('open', 'suburb', 'urban', 'fog'):
            sdf = build_scene(kind, rng, Z, Y, X, c.z_bound_seg,
                              c.y_bound_seg, c.x_bound_seg)
            # nearest-neighbor sample along rays (statistics only — the
            # carried-optical-depth curves, not exact field values)
            ix = np.clip(np.rint((coords[..., 0] + 1) / 2 * (X - 1)), 0,
                         X - 1).astype(np.int64)
            iy = np.clip(np.rint((coords[..., 1] + 1) / 2 * (Y - 1)), 0,
                         Y - 1).astype(np.int64)
            iz = np.clip(np.rint((coords[..., 2] + 1) / 2 * (Z - 1)), 0,
                         Z - 1).astype(np.int64)
            samp = sdf[iz, iy, ix] * valid
            dens = np.asarray(R.laplace_density(jnp.asarray(samp), 0.1,
                                                c.sdf_bias))
            sd = np.cumsum(dens * dl, axis=1)     # carried optical depth
            L = np.where(valid.any(1), Sn - valid[:, ::-1].argmax(1), 0)
            for j in range(n_et):
                s_j = prefix * chunk + j * chunk   # first sample of ET pass j
                alive = L > s_j
                for t in taus:
                    need = alive & (sd[:, max(s_j - 1, 0)] < t)
                    demand[t][j] = max(demand[t][j], need.mean())
            line = ' '.join(f'{(L > prefix * chunk + j * chunk).mean():.3f}'
                            for j in range(n_et))
            print(f'scene {kind:7s} seed {seed}: alive-by-L {line}')

    print(f'\nSn={Sn} chunk={chunk} prefix={prefix} n_et={n_et}')
    for t in taus:
        sched = np.minimum(1.0, demand[t] * 1.10 + 0.02)
        rows = np.array([min(1.0, f) for f in sched])
        total = (prefix * chunk + chunk * rows.sum()) / Sn
        print(f'tau={t}: worst demand {np.round(demand[t], 3)}')
        print(f'  schedule (+10%+0.02) {tuple(np.round(sched, 3))} '
              f'-> rows {total:.2f}x dense')


if __name__ == '__main__':
    main()
