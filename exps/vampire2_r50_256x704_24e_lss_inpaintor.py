"""Experiment entry: vampire2_r50_256x704_24e_lss_inpaintor
(reference src/exps/nuscenes/ablation/vampire2_r50_256x704_24e_lss_inpaintor.py).

Run: python exps/vampire2_r50_256x704_24e_lss_inpaintor.py [cli args]
"""
import sys

from vampire_tpu.cli import main

if __name__ == '__main__':
    main(['--exp', 'lss_inpaintor'] + sys.argv[1:])
