"""Persistent TPU job runner (round-5 measurement infrastructure).

The axon TPU pool can take minutes (measured: 503 s) to grant a NEW process
its first device op, which makes one-script-per-measurement workflows
unusable under contention. This runner pays the grant cost once and then
executes job files in-process, sharing the initialized JAX runtime:

    python scripts/tpu_jobrunner.py [--jobs /tmp/tpu_jobs]

Drop `<name>.py` into the jobs dir; the runner exec()s it (fresh __main__-like
globals, stdout/stderr teed to `<name>.out`), then renames the job to
`<name>.done` (or `.fail` with the traceback in the .out). Jobs run in
arrival order. An empty file named `quit` shuts the runner down.

Job files share the process: leaked globals die with the job's dict, but
device allocations persist until garbage-collected — keep big arrays local
or del them.
"""
import argparse
import io
import os
import sys
import time
import traceback

sys.path.insert(0, '/root/repo')


class _Tee(io.TextIOBase):
    def __init__(self, *streams):
        self.streams = streams

    def write(self, s):
        for st in self.streams:
            st.write(s)
            st.flush()
        return len(s)

    def flush(self):
        for st in self.streams:
            st.flush()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--jobs', default='/tmp/tpu_jobs')
    args = ap.parse_args()
    os.makedirs(args.jobs, exist_ok=True)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from vampire_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache()
    t0 = time.time()
    np.asarray(jnp.ones((8, 8)) * 2)   # pay the grant cost up front
    print(f'[runner] device ready in {time.time() - t0:.0f}s: '
          f'{jax.devices()}', flush=True)

    while True:
        if os.path.exists(os.path.join(args.jobs, 'quit')):
            os.remove(os.path.join(args.jobs, 'quit'))
            print('[runner] quit', flush=True)
            return
        jobs = sorted(f for f in os.listdir(args.jobs) if f.endswith('.py'))
        if not jobs:
            time.sleep(2.0)
            continue
        name = jobs[0]
        path = os.path.join(args.jobs, name)
        out_path = path[:-3] + '.out'
        print(f'[runner] running {name}', flush=True)
        # pick up source edits between jobs: drop cached package modules
        # (jax and its compiled caches stay warm; vampire_tpu re-imports in
        # ~1s). Keeps the long-lived device grant while allowing iteration.
        for mod in [m for m in sys.modules if m.startswith('vampire_tpu')]:
            del sys.modules[mod]
        src = open(path).read()
        t0 = time.time()
        ok = True
        with open(out_path, 'w') as out:
            tee_out, tee_err = _Tee(sys.__stdout__, out), _Tee(sys.__stderr__, out)
            old = sys.stdout, sys.stderr
            sys.stdout, sys.stderr = tee_out, tee_err
            try:
                g = {'__name__': '__main__', '__file__': path}
                exec(compile(src, path, 'exec'), g)
            except BaseException:
                ok = False
                traceback.print_exc()
            finally:
                sys.stdout, sys.stderr = old
        dst = path[:-3] + ('.done' if ok else '.fail')
        os.replace(path, dst)
        print(f'[runner] {name} -> {os.path.basename(dst)} '
              f'({time.time() - t0:.0f}s)', flush=True)


if __name__ == '__main__':
    main()
