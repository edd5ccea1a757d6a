#!/usr/bin/env python3
"""Memory-BANDWIDTH parallel probe, the complement of burn.py (register
arithmetic): N workers stream over private 256 MiB buffers at C speed
(bytes.count releases the GIL and is a pure sequential memory scan);
prints aggregate GiB/s. If burn.py scales with workers but this does
not, the host's cores share a saturated memory pipe — string/shuffle
workloads then stop scaling at the worker count where the pipe fills,
regardless of core count.
"""
import multiprocessing as mp
import sys
import time

SECONDS = 3.0
BUF_MB = 256


def stream(out):
    buf = bytes(BUF_MB * 1024 * 1024)
    t0 = time.time()
    n = 0
    while time.time() - t0 < SECONDS:
        n += buf.count(255)  # full sequential scan of the buffer
        n += 1
    out.put((n, BUF_MB * (n if n < 10**6 else 0)))


def main(workers):
    q = mp.Queue()
    ps = [mp.Process(target=stream, args=(q,)) for _ in range(workers)]
    t0 = time.time()
    for p in ps:
        p.start()
    results = [q.get() for _ in ps]
    for p in ps:
        p.join()
    scans = sum(r[0] for r in results)
    gib = scans * BUF_MB / 1024.0
    print(f'{{"workers": {workers}, "gib_per_sec": {gib / SECONDS:.2f}}}')


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 1)
