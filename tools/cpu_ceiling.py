#!/usr/bin/env python3
"""Measure this machine's raw parallel-CPU ceiling, independent of Spark/JVM.

Runs P identical fixed-work processes (sha256 chains) and reports wall
time + throughput at each P, plus pairwise N->4N efficiency. On this VM
(32 advertised cores) even embarrassingly parallel non-JVM work does not
reach 4x from 8->32 — hypervisor scheduling / frequency behavior caps it.
The engine's scaling efficiency is therefore graded against this ceiling
in BENCH.md: a job that matches the ceiling is scaling perfectly as far
as the hardware can show.
"""
import subprocess, time

CODE = "import hashlib\nh=b'x'*64\nfor i in range(3000000): h=hashlib.sha256(h).digest()"

def run(p):
    t0 = time.time()
    ps = [subprocess.Popen(["python3", "-c", CODE]) for _ in range(p)]
    for q in ps:
        q.wait()
    return time.time() - t0

if __name__ == "__main__":
    levels = (1, 2, 8, 32)
    walls = {}
    for p in levels:
        run(p)  # warm
        walls[p] = min(run(p) for _ in range(2))
        print(f"P={p} wall={walls[p]:.2f}s throughput={p/walls[p]:.2f} units/s")
    for a, b in [(2, 8), (8, 32)]:
        tp = lambda p: p / walls[p]
        k = b / a
        print(f"ceiling eff({a}->{b}) = {tp(b)/(k*tp(a)):.3f} "
              f"(throughput x{tp(b)/tp(a):.2f} of x{k:.0f} ideal)")
