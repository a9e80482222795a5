"""Virtual-mesh scaling study: the sharded train step at 8/16/32 devices.

Real multi-chip hardware is not available in this environment; this
exercises the SAME pjit-sharded train step the dryrun validates on
progressively larger virtual CPU meshes (dp x cam), confirming that

  * mesh construction, batch/state shardings and the implicit grad psum
    generalize beyond the 8-device test mesh;
  * per-device batch stays constant as dp scales (weak scaling: global
    batch = dp), the deployment layout of SURVEY.md §2.4;

and records wall times. CPU timings do NOT model ICI latency — the value
here is compile-and-execute validation at scale, not a performance model.

Run: python scripts/scaling_study.py [--devices 8,16,32]
"""
import argparse
import subprocess
import sys
import time

sys.path.insert(0, '/root/repo')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--devices', default='8,16,32')
    args = ap.parse_args()
    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for n in [int(x) for x in args.devices.split(',')]:
        env = dict(os.environ)
        env['JAX_PLATFORMS'] = 'cpu'
        env['XLA_FLAGS'] = f'--xla_force_host_platform_device_count={n}'
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable, os.path.join(here, '__graft_entry__.py'),
             'multichip', str(n)],
            env=env, cwd=here, capture_output=True, text=True, timeout=3600)
        dt = time.perf_counter() - t0
        ok = proc.returncode == 0
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout else ''
        print(f'n={n:3d}  {"ok" if ok else "FAIL"}  {dt:6.1f}s  {line}',
              flush=True)
        if not ok:
            print(proc.stderr[-2000:], flush=True)


if __name__ == '__main__':
    main()
