#!/usr/bin/env python3
"""Bounded TPU-relay health probe (run before queueing TPU work).

The axon relay serializes compiles across processes and has been observed
to wedge for hours (trivial matmuls timing out >10 min). This probe runs
one tiny matmul with a hard wall-clock bound and exits 0 (healthy, prints
the round-trip seconds) or 1 (wedged/timed out) — cheap to gate every TPU
job on:

    python scripts/tpu_relay_probe.py --timeout 300 && python bench.py

--watch N retries every N seconds until healthy (the retry-loop pattern
from the working notes), printing one status line per attempt. The probe
runs the matmul in a SUBPROCESS so a wedged backend initialization cannot
hang the probe itself (anything that initializes axon blocks while the
relay is down).
"""

import argparse
import subprocess
import sys
import time

_CHILD = r"""
import time, numpy as np
t0 = time.time()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256), jnp.bfloat16)
v = float(np.asarray((x @ x).sum()))
print(f"{time.time()-t0:.1f}s val={v} dev={jax.devices()[0].platform}")
"""


def probe(timeout: float) -> bool:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", _CHILD],
                           capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        print(f"relay probe TIMED OUT after {timeout:.0f}s — treat as "
              "wedged; do not queue TPU work", flush=True)
        return False
    if r.returncode != 0:
        print(f"relay probe FAILED:\n{r.stderr[-1000:]}", flush=True)
        return False
    print(f"relay healthy: compile+execute round trip "
          f"{time.time()-t0:.1f}s ({r.stdout.strip().splitlines()[-1]})",
          flush=True)
    return True


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--timeout", type=float, default=300.0,
                   help="hard bound per attempt, seconds")
    p.add_argument("--watch", type=float, default=None, metavar="SECONDS",
                   help="retry every N seconds until healthy")
    args = p.parse_args()
    while True:
        if probe(args.timeout):
            sys.exit(0)
        if args.watch is None:
            sys.exit(1)
        print(f"retrying in {args.watch:.0f}s ...", flush=True)
        time.sleep(args.watch)


if __name__ == "__main__":
    main()
