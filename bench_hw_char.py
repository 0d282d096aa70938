"""Pure-multiprocessing (no Spark) CTW-kernel scaling probe: is the VM
flat from 2 to 8 concurrent processes TODAY? taskset-pins the whole
process set to exactly n cores, each worker loops the CPU-bound kernel."""
import json, os, subprocess, sys, time

WORKER = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from fasta_windows_spark import kernels as K
import numpy as np
rng = np.random.default_rng(int(sys.argv[1]))
alpha = np.frombuffer(b"ACGT", dtype=np.uint8)
text = alpha[rng.integers(0, 4, size=200_000, dtype=np.uint8)].tobytes().decode()
wins = [text[i:i+1000] for i in range(0, len(text), 1000)]
t0 = time.perf_counter(); n = 0
while time.perf_counter() - t0 < 25:
    K.ctw_bits_per_base_many(wins[:50], max_depth=6)
    n += 50
dt = time.perf_counter() - t0
print(n / dt)
'''

def run(nproc):
    procs = []
    for i in range(nproc):
        cmd = ["taskset", "-c", f"0-{nproc-1}", sys.executable, "-c", WORKER, str(i)]
        procs.append(subprocess.Popen(cmd, stdout=subprocess.PIPE, text=True))
    rates = [float(p.communicate()[0].strip().splitlines()[-1]) for p in procs]
    return sum(rates) / len(rates), sum(rates)

for n in (2, 8):
    per, agg = run(n)
    print(json.dumps({"procs": n, "win_per_sec_per_proc": round(per,1), "aggregate": round(agg,1)}))
