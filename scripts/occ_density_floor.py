"""Occ-density convergence floor analysis (VERDICT r4 #9).

The convergence study's two occ density terms converge to ratio ~0.61
(visible 0.258 -> 0.157, invisible 0.267 -> 0.169) while every other term
drops below 0.16. Is that "slow but correct" or "wrong scale/mask"? This
script computes the quantities that distinguish the two, entirely offline:

  1. ORACLE FLOOR — the loss of the best density field the architecture can
     represent: rasterize each study scene's true occupancy (ground plane +
     car boxes) onto the FIELD grid (20x256x256 @ 0.4 m), push an ideal
     density volume (amplitude sweep) through the exact occ query path the
     model uses (static separable interpolation + tanh, field.py _query_occ
     lss branch), and evaluate the two masked MSE terms against the study's
     own labels. The occ grid lattice is alignment-checked against the field
     lattice (they share the 0.4 m pitch; xy/z offsets land exactly on field
     centers, so interpolation is a selection, not a blur).
  2. ALL-FREE BASELINE — the loss of predicting density 0 everywhere
     (= the visible/invisible occupancy fraction). A converged model WORSE
     than this is not "slow", it is being pulled away from the labels.
  3. The study's converged values, read from convergence_study.json.

Interpretation key (written into the output JSON):
  floor << converged < all-free  ->  under-trained but converging correctly
  converged <= floor * 1.5       ->  at the representational floor
  converged > all-free           ->  a conflicting-gradient or scale bug

Run: python scripts/occ_density_floor.py  (CPU, ~1 min)
Writes scripts/occ_density_floor.json.

Reference: density losses base_exp.py:398-401; Occ3D query
base_vampire2.py:597-611.
"""
import json
import os
import sys

sys.path.insert(0, '/root/repo')
os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import numpy as np


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import jax.numpy as jnp
    from vampire_tpu.configs import flagship_config
    from vampire_tpu.core import geometry as G
    from vampire_tpu.core import sampling as S
    from vampire_tpu.data.synthetic import consistent_batch, _points_in_box
    from vampire_tpu.models.field import FieldBackbone  # noqa: F401 (docs)

    cfg = flagship_config()
    bc = cfg.backbone
    Zs, Ys, Xs = bc.grid_zyx('seg')

    # field grid centers (z, y, x axes as the model's volumes)
    zc = G.centers_of(bc.z_bound_seg)
    yc = G.centers_of(bc.y_bound_seg)
    xc = G.centers_of(bc.x_bound_seg)

    # occ grid centers (gx, gy, gz, 3) xyz
    occ_c = G.make_occ_coords(bc.occ_pc_range, bc.occ_voxel_size, bc.occ_grid)
    occ_x = occ_c[:, 0, 0, 0]
    occ_y = occ_c[0, :, 0, 1]
    occ_z = occ_c[0, 0, :, 2]

    # ---- lattice alignment check: every in-range occ center must land
    # exactly on a field center (shared 0.4 m pitch) ----
    def offgrid(q, centers):
        d = np.abs(q[:, None] - centers[None, :]).min(1)
        return float(d[(q >= centers.min()) & (q <= centers.max())].max())

    align = dict(x=offgrid(occ_x, xc), y=offgrid(occ_y, yc),
                 z=offgrid(occ_z, zc))
    aligned = max(align.values()) < 1e-4

    # the exact sampling matrices the model's lss/lss_inpaintor occ query
    # uses (field.py setup: _occ_mats_zeros for density)
    def norm1d(centers, bound):
        return (centers - bound[0]) / (bound[1] - bound[0]) * 2.0 - 1.0
    mats = (S.make_sample_matrix(norm1d(occ_z, bc.z_bound_seg), Zs, True, 'zeros'),
            S.make_sample_matrix(norm1d(occ_y, bc.y_bound_seg), Ys, True, 'zeros'),
            S.make_sample_matrix(norm1d(occ_x, bc.x_bound_seg), Xs, True, 'zeros'))

    def query_density(dens_vol):
        """(1, Z, Y, X) field density -> (1, gx, gy, gz) tanh'd occ density —
        the model's _query_occ static branch verbatim."""
        out = S.apply_sample_matrices(dens_vol[..., None], mats, (1, 2, 3))[..., 0]
        return np.asarray(jnp.tanh(jnp.transpose(out, (0, 3, 2, 1))))

    def masked_mse(pred, labels, mask):
        m = mask.astype(np.float64)
        return float(((labels - pred) ** 2 * m).sum() / max(m.sum(), 1.0))

    seeds = list(range(4))          # the study's --batches 4 scenes
    amplitudes = [2.0, 3.0, 5.0, 10.0]
    per_seed = []
    for seed in seeds:
        b = consistent_batch(cfg, batch_size=1, n_points=4096, n_boxes=8,
                             seed=seed, mode='train')
        labels = b['occ_density_labels'][0].astype(np.float64)
        vis = b['mask_camera'][0]
        invis = ~vis

        # true occupancy on the FIELD grid from the same scene definition:
        # ground voxels |z| <= vz/2 (synthetic.py), plus the scene's boxes
        gz, gy, gx3 = np.meshgrid(zc, yc, xc, indexing='ij')
        fpts = np.stack([gx3.ravel(), gy, np.zeros(0)], axis=0) \
            if False else np.stack(
                [gx3.ravel(), np.meshgrid(zc, yc, xc, indexing='ij')[1].ravel(),
                 gz.ravel()], axis=1)
        # (columns: x, y, z)
        occ_f = np.abs(fpts[:, 2]) <= bc.occ_voxel_size[2] / 2.0
        for box in b['gt_boxes_list'][0]:
            occ_f |= _points_in_box(fpts.astype(np.float32), box)
        occ_field = occ_f.reshape(Zs, Ys, Xs).astype(np.float32)

        row = dict(seed=seed,
                   vis_frac_occupied=masked_mse(0.0, labels, vis),
                   invis_frac_occupied=masked_mse(0.0, labels, invis))
        best = (np.inf, np.inf, None)
        for A in amplitudes:
            pred = query_density(jnp.asarray(A * occ_field[None]))[0]
            v = masked_mse(pred, labels, vis)
            iv = masked_mse(pred, labels, invis)
            if v + iv < best[0] + best[1]:
                best = (v, iv, A)
        row.update(oracle_vis=best[0], oracle_invis=best[1],
                   oracle_amplitude=best[2])
        per_seed.append(row)
        print(f'seed {seed}: all-free vis {row["vis_frac_occupied"]:.4f} '
              f'invis {row["invis_frac_occupied"]:.4f} | oracle (A='
              f'{best[2]}) vis {best[0]:.4f} invis {best[1]:.4f}', flush=True)

    def mean(k):
        return float(np.mean([r[k] for r in per_seed]))

    study = {}
    study_path = os.path.join(os.path.dirname(__file__),
                              'convergence_study.json')
    if os.path.exists(study_path):
        s = json.load(open(study_path))['summary']
        study = dict(vis=s['visible_occ_density_loss']['last'],
                     invis=s['invisible_occ_density_loss']['last'])

    out = dict(
        lattice_alignment_max_offset_m=align, lattices_aligned=aligned,
        per_seed=per_seed,
        mean=dict(all_free_vis=mean('vis_frac_occupied'),
                  all_free_invis=mean('invis_frac_occupied'),
                  oracle_vis=mean('oracle_vis'),
                  oracle_invis=mean('oracle_invis')),
        study_converged=study,
    )
    # verdict string the study doc can cite
    if study:
        c = study['vis']
        fl, af = out['mean']['oracle_vis'], out['mean']['all_free_vis']
        if c <= fl * 1.5:
            verdict = 'converged-at-floor'
        elif c < af:
            verdict = 'under-trained-but-correct (floor << converged < all-free)'
        else:
            verdict = ('converged ABOVE the all-free baseline: the density '
                       'field is being pulled away from the occ labels by a '
                       'conflicting term (suspects: camera depth compositing '
                       'wants thick surfaces; shared field with seg terms)')
        out['verdict'] = verdict
        print('verdict:', verdict)
    path = os.path.join(os.path.dirname(__file__), 'occ_density_floor.json')
    with open(path, 'w') as f:
        json.dump(out, f, indent=1)
    print('wrote', path)


if __name__ == '__main__':
    main()
