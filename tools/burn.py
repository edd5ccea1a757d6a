#!/usr/bin/env python3
"""Pure-CPU parallel-throughput probe for the scaling-ceiling table in
BENCH/BASELINE.md: N worker processes spin on register arithmetic for a
fixed wall window; prints aggregate iterations/s. Run under taskset to
measure the PINNED ceiling (e.g. `taskset -c 0-3 tools/burn.py 4`).
"""
import multiprocessing as mp
import sys
import time

SECONDS = 3.0


def spin(out):
    t0 = time.time()
    x = 0
    n = 0
    while time.time() - t0 < SECONDS:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) & 0x7FFFFFFF
        n += 100000
    out.put(n)


def main(workers):
    q = mp.Queue()
    ps = [mp.Process(target=spin, args=(q,)) for _ in range(workers)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    print(f'{{"workers": {workers}, "iters_per_sec": {total / SECONDS:.0f}}}')


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
