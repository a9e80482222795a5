"""Experiment CLI (reference `run_cli`, src/exps/base_cli.py:12-136).

Usage:
  python -m vampire_tpu.cli --exp lss_inpaintor_depth_semantic          # fit
  python -m vampire_tpu.cli --exp ... -v --ckpt-step 23                 # validate
  python -m vampire_tpu.cli --exp ... -t                                # test (det)
  python -m vampire_tpu.cli --exp ... -p                                # predict/submit

Defaults mirror the reference trainer config (base_cli.py:69-92): bf16 compute
with fp32 islands (the reference uses fp16 AMP), grad clip 35, val every 4
epochs, max_epochs 24, per-device batch via -b, seed 0.
"""
from __future__ import annotations

import argparse
import dataclasses
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser('vampire-tpu')
    p.add_argument('--exp', default='lss_inpaintor_depth_semantic',
                   help='ablation name (configs.ablation_config) or "flagship"')
    mode = p.add_mutually_exclusive_group()
    mode.add_argument('-v', '--validate', action='store_true')
    mode.add_argument('-t', '--test', action='store_true')
    mode.add_argument('-p', '--predict', action='store_true')
    p.add_argument('--vis', action='store_true')
    p.add_argument('--debug', action='store_true',
                   help='CPU tiny-config smoke run (reference --debug)')
    p.add_argument('--trainval', action='store_true')
    p.add_argument('-b', '--batch-size-per-device', type=int, default=8)
    p.add_argument('--max-epochs', type=int, default=24)
    p.add_argument('--data-root', default='data/nuScenes')
    p.add_argument('--workdir', default='./outputs')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--ckpt-step', type=int, default=None,
                   help='checkpoint index: eval modes restore it; fit mode '
                        'fine-tunes from its weights (reference --ckpt_path, '
                        'base_cli.py:130-136)')
    p.add_argument('--no-resume', action='store_true',
                   help='fit: do NOT auto-resume from the latest checkpoint '
                        'in the workdir')
    p.add_argument('--use-ema', action='store_true')
    p.add_argument('--num-workers', type=int, default=4)
    p.add_argument('--num-devices', type=int, default=None,
                   help='use only the first N local devices (reference '
                        '--gpus, base_cli.py:33); single-process only; '
                        'default: all')
    p.add_argument('--pretrained-backbone', default='',
                   help='torchvision resnet .pth grafted onto the image '
                        'backbone at init (the reference recipe, '
                        'base_exp.py:73)')
    p.add_argument('--sweep-idxes', default=None,
                   help='comma-separated temporal sweep-frame indexes into '
                        'the infos\' cam_sweeps history (e.g. "0" or "0,2"); '
                        'enables multi-sweep temporal fusion (the reference '
                        'accepts --sweep_idxes but raises NotImplementedError '
                        'in the forward, base_vampire2.py:690-693). Default: '
                        'the experiment config\'s sweep_idxes')
    return p


def _parse_sweep_idxes(s):
    s = s.strip()
    return tuple(int(t) for t in s.split(',') if t.strip()) if s else ()


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if args.debug:
        os.environ.setdefault('JAX_PLATFORMS', 'cpu')
    import jax
    if args.debug:
        jax.config.update('jax_platforms', 'cpu')
    # multi-host bring-up (no-op single process; TPU pods autodetect via
    # env, CPU clusters via JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/
    # JAX_PROCESS_ID) — replaces torch DDP init (base_cli.py:105)
    from .parallel.distributed import initialize as dist_initialize
    dist_initialize()
    from .configs import ablation_config, flagship_config, DET_CLASSES
    from .data.nuscenes import DataLoader, NuscDetSegDataset
    from .data.synthetic import tiny_config
    from .training.trainer import Trainer

    if args.debug:
        cfg = tiny_config()
    elif args.exp == 'flagship':
        cfg = flagship_config()
    else:
        cfg = ablation_config(args.exp)
    n_dev = args.num_devices or jax.device_count()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train,
        batch_size_per_device=args.batch_size_per_device,
        max_epochs=args.max_epochs,
        data_root=args.data_root,
        num_devices=n_dev,
        use_ema=args.use_ema,
        pretrained_backbone=args.pretrained_backbone,
        seed=args.seed,
        **({'sweep_idxes': _parse_sweep_idxes(args.sweep_idxes)}
           if args.sweep_idxes is not None else {})))

    mesh = None
    if args.num_devices:
        if jax.process_count() > 1:
            raise SystemExit('--num-devices is single-process only: a '
                             'device-subset mesh cannot be formed '
                             'consistently across pod processes')
        from .parallel.mesh import default_mesh
        mesh = default_mesh(jax.devices()[:n_dev])
    trainer = Trainer(cfg, workdir=args.workdir, mesh=mesh)
    data_root = args.data_root

    def make_loader(split: str, mode: str, shuffle: bool):
        # the test split has no Occ3D labels (base_exp.py:313-314)
        name = ('nuscenes_infos_test.pkl' if split == 'test'
                else f'nuscenes_occ_infos_{split}.pkl')
        info = os.path.join(data_root, name)
        ds = NuscDetSegDataset(
            ida_aug=cfg.ida_aug, bda_aug=cfg.bda_aug,
            classes=list(DET_CLASSES), data_root=data_root, info_paths=info,
            head_cfg=cfg.head, mode=mode,
            sweep_idxes=cfg.train.sweep_idxes,
            max_points=cfg.train.max_points, seed=args.seed,
            seg_bounds=(cfg.backbone.x_bound_seg, cfg.backbone.y_bound_seg,
                        cfg.backbone.z_bound_seg))
        global_batch = cfg.train.batch_size_per_device * n_dev
        # eval/predict must cover EVERY sample (the reference truncates the
        # DDP gather to the dataset length, base_exp.py:920-927); only the
        # train loader drops the ragged tail. Multi-host: each process loads
        # its (rank, world) block of every global batch.
        world = jax.process_count()
        return DataLoader(ds, batch_size=global_batch // world,
                          shuffle=shuffle, num_workers=args.num_workers,
                          seed=args.seed, drop_last=(mode == 'train'),
                          rank=jax.process_index(), world_size=world)

    if args.validate or args.test or args.predict:
        loader = make_loader('val' if not args.predict else 'test',
                             'val' if not args.predict else 'test', False)
        first = next(iter(loader))
        state = trainer.init_state(first, steps_per_epoch=max(1, len(loader)))
        state = trainer.restore_checkpoint(state, step=args.ckpt_step,
                                           weights_only=True)
        if args.validate:
            trainer.validate(loader, state)
        elif args.predict:
            trainer.predict(loader, state)
        else:
            trainer.test(loader, state, vis=args.vis)
        return

    train_loader = make_loader('trainval' if args.trainval else 'train',
                               'train', True)
    val_loader = make_loader('val', 'val', False)
    trainer.fit(train_loader, val_loader, resume=not args.no_resume,
                finetune_from=args.ckpt_step)


if __name__ == '__main__':
    main()
