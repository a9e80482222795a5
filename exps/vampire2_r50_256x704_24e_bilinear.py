"""Experiment entry: vampire2_r50_256x704_24e_bilinear
(reference src/exps/nuscenes/ablation/vampire2_r50_256x704_24e_bilinear.py).

Run: python exps/vampire2_r50_256x704_24e_bilinear.py [cli args]
"""
import sys

from vampire_tpu.cli import main

if __name__ == '__main__':
    main(['--exp', 'bilinear'] + sys.argv[1:])
