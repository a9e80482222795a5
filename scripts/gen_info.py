"""Offline info-pickle generator for nuScenes (reference scripts/gen_info.py).

Walks the nuScenes DB and writes per-sample dicts:
  sample_token, timestamp, scene_token,
  cam_infos[cam]   = {sample_token, ego_pose, timestamp, is_key_frame, height,
                      width, filename, calibrated_sensor},
  lidar_infos['LIDAR_TOP'] = {..., lidar_token, lidarseg_labels_filename},
  cam_sweeps / lidar_sweeps = per-frame histories (same fields),
  occ_infos = {occ_gt_path} from the Occ3D annotations.json,
  ann_infos = sample_annotation records + box_velocity.

Requires nuscenes-devkit and the dataset on disk; run where both exist:
  python scripts/gen_info.py --data-root data/nuScenes --version v1.0-trainval
"""
from __future__ import annotations

import argparse
import json
import os
import pickle


def generate_info(nusc, scenes, max_cam_sweeps=6, max_lidar_sweeps=10,
                  occ_anno=None):
    import numpy as np
    cam_names = ['CAM_FRONT', 'CAM_FRONT_RIGHT', 'CAM_BACK_RIGHT', 'CAM_BACK',
                 'CAM_BACK_LEFT', 'CAM_FRONT_LEFT']
    lidar_names = ['LIDAR_TOP']
    infos = []
    for cur_scene in nusc.scene:
        if cur_scene['name'] not in scenes:
            continue
        cur_sample = nusc.get('sample', cur_scene['first_sample_token'])
        while True:
            info = dict(sample_token=cur_sample['token'],
                        timestamp=cur_sample['timestamp'],
                        scene_token=cur_sample['scene_token'])
            cam_datas, lidar_datas = [], []
            cam_infos, lidar_infos = {}, {}
            for cam in cam_names:
                cd = nusc.get('sample_data', cur_sample['data'][cam])
                cam_datas.append(cd)
                cam_infos[cam] = dict(
                    sample_token=cd['sample_token'],
                    ego_pose=nusc.get('ego_pose', cd['ego_pose_token']),
                    timestamp=cd['timestamp'],
                    is_key_frame=cd['is_key_frame'],
                    height=cd['height'], width=cd['width'],
                    filename=cd['filename'],
                    calibrated_sensor=nusc.get(
                        'calibrated_sensor', cd['calibrated_sensor_token']))
            for ln in lidar_names:
                ld = nusc.get('sample_data', cur_sample['data'][ln])
                lidar_datas.append(ld)
                try:
                    seg = nusc.get('lidarseg', ld['token'])['filename']
                except KeyError:
                    seg = None
                lidar_infos[ln] = dict(
                    sample_token=ld['sample_token'],
                    lidar_token=ld['token'],
                    ego_pose=nusc.get('ego_pose', ld['ego_pose_token']),
                    timestamp=ld['timestamp'],
                    filename=ld['filename'],
                    calibrated_sensor=nusc.get(
                        'calibrated_sensor', ld['calibrated_sensor_token']),
                    lidarseg_labels_filename=seg)
            info['cam_infos'] = cam_infos
            info['lidar_infos'] = lidar_infos
            occ_infos = {}
            if occ_anno is not None:
                occ_infos['occ_gt_path'] = (
                    occ_anno['scene_infos'][cur_scene['name']]
                    [cur_sample['token']]['gt_path'])
            info['occ_infos'] = occ_infos

            cam_sweeps = [dict() for _ in range(max_cam_sweeps)]
            for k, cd in enumerate(cam_datas):
                sweep = cd
                for j in range(max_cam_sweeps):
                    if sweep['prev'] == '':
                        break
                    sweep = nusc.get('sample_data', sweep['prev'])
                    if sweep['sample_token'] != cd['sample_token']:
                        break
                    cam_sweeps[j][cam_names[k]] = dict(
                        sample_token=sweep['sample_token'],
                        ego_pose=nusc.get('ego_pose', cd['ego_pose_token']),
                        timestamp=sweep['timestamp'],
                        is_key_frame=sweep['is_key_frame'],
                        height=sweep['height'], width=sweep['width'],
                        filename=sweep['filename'],
                        calibrated_sensor=nusc.get(
                            'calibrated_sensor', cd['calibrated_sensor_token']))
            lidar_sweeps = [dict() for _ in range(max_lidar_sweeps)]
            for k, ld in enumerate(lidar_datas):
                sweep = ld
                for j in range(max_lidar_sweeps):
                    if sweep['prev'] == '':
                        break
                    sweep = nusc.get('sample_data', sweep['prev'])
                    if sweep['sample_token'] != ld['sample_token']:
                        break
                    try:
                        seg = nusc.get('lidarseg', sweep['token'])['filename']
                    except KeyError:
                        seg = None
                    lidar_sweeps[j][lidar_names[k]] = dict(
                        sample_token=sweep['sample_token'],
                        ego_pose=nusc.get('ego_pose', sweep['ego_pose_token']),
                        timestamp=sweep['timestamp'],
                        is_key_frame=sweep['is_key_frame'],
                        filename=sweep['filename'],
                        calibrated_sensor=nusc.get(
                            'calibrated_sensor', ld['calibrated_sensor_token']),
                        lidarseg_labels_filename=seg)
            for i, sweep in enumerate(cam_sweeps):
                if not sweep:
                    cam_sweeps = cam_sweeps[:i]
                    break
            for i, sweep in enumerate(lidar_sweeps):
                if not sweep:
                    lidar_sweeps = lidar_sweeps[:i]
                    break
            info['cam_sweeps'] = cam_sweeps
            info['lidar_sweeps'] = lidar_sweeps

            ann_infos = []
            for ann in cur_sample.get('anns', []):
                ai = dict(nusc.get('sample_annotation', ann))
                vel = nusc.box_velocity(ai['token'])
                if np.any(np.isnan(vel)):
                    vel = np.zeros(3)
                ai['velocity'] = vel
                # resolved attribute names (the devkit reads these from the
                # DB at eval time; the in-repo metric reads them from here)
                ai['attribute_names'] = [
                    nusc.get('attribute', t)['name']
                    for t in ai.get('attribute_tokens', [])]
                ann_infos.append(ai)
            info['ann_infos'] = ann_infos
            infos.append(info)
            if cur_sample['next'] == '':
                break
            cur_sample = nusc.get('sample', cur_sample['next'])
    return infos


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data-root', default='data/nuScenes')
    ap.add_argument('--version', default='v1.0-trainval')
    ap.add_argument('--occ-anno', default=None,
                    help='Occ3D annotations.json (defaults to '
                         '<data-root>/annotations.json)')
    args = ap.parse_args()
    from nuscenes.nuscenes import NuScenes
    from nuscenes.utils import splits
    nusc = NuScenes(version=args.version, dataroot=args.data_root,
                    verbose=True)
    occ_anno = None
    occ_path = args.occ_anno or os.path.join(args.data_root,
                                             'annotations.json')
    if os.path.exists(occ_path):
        with open(occ_path) as f:
            occ_anno = json.load(f)
    if args.version == 'v1.0-test':
        test = generate_info(nusc, splits.test)
        with open(os.path.join(args.data_root, 'nuscenes_infos_test.pkl'),
                  'wb') as f:
            pickle.dump(test, f)
        return
    train = generate_info(nusc, splits.train, occ_anno=occ_anno)
    val = generate_info(nusc, splits.val, occ_anno=occ_anno)
    for name, data in (('train', train), ('val', val),
                       ('trainval', train + val)):
        with open(os.path.join(args.data_root,
                               f'nuscenes_occ_infos_{name}.pkl'), 'wb') as f:
            pickle.dump(data, f)


if __name__ == '__main__':
    main()
