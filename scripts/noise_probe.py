#!/usr/bin/env python
"""Host-steal probe: time a fixed busy-loop single-proc, then 32 concurrent
procs. On a quiet 32-core box the per-task wall at 32 procs is ~1.0-1.3x the
single-proc wall; host steal inflates it."""
import time, multiprocessing as mp

def burn(n=4_000_000):
    s = 0
    for i in range(n):
        s += i * i
    return s

def timed(f):
    t = time.perf_counter(); f(); return time.perf_counter() - t

if __name__ == "__main__":
    single = min(timed(burn) for _ in range(3))
    t0 = time.perf_counter()
    with mp.Pool(32) as p:
        p.map(burn, [4_000_000] * 64)  # 2 waves of 32
    wall = time.perf_counter() - t0
    per_task = wall / 2
    ratio = per_task / single
    print(f"single={single:.3f}s per_wave={per_task:.3f}s ratio={ratio:.2f} "
          f"{'CLEAN' if ratio < 1.6 else 'NOISY'}")
