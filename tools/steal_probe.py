"""Gate a heavy benchmark run on a steal-quiet window.

Hypervisor steal on this box is load-following: it only shows up under
CPU pressure, so an idle reading proves nothing.  This probe burns all
cores for --burn seconds and reads the /proc/stat steal delta; the
window is declared quiet after --need consecutive burns each below
--max-rate jiffies/second.  Exits 0 when quiet, 1 on --timeout.

Usage: python tools/steal_probe.py [--burn 8] [--max-rate 40]
           [--need 2] [--timeout 3600]
"""

from __future__ import annotations

import argparse
import multiprocessing
import os
import sys
import time


def _steal_j() -> int:
    with open("/proc/stat") as f:
        parts = f.readline().split()
    return int(parts[8])  # steal is field 8 of the aggregate cpu line


def _burn(stop_t: float) -> None:
    x = 1.0
    while time.time() < stop_t:
        x = x * 1.0000001 + 1.0
        if x > 1e12:
            x = 1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--burn", type=float, default=8.0)
    ap.add_argument("--max-rate", type=float, default=40.0)
    ap.add_argument("--need", type=int, default=2)
    ap.add_argument("--timeout", type=float, default=3600.0)
    ap.add_argument("--cooldown", type=float, default=20.0,
                    help="wait between probes so the burn itself does not"
                         " keep attracting load-following steal")
    args = ap.parse_args()

    deadline = time.time() + args.timeout
    streak = 0
    ncpu = os.cpu_count() or 1
    while time.time() < deadline:
        s0 = _steal_j()
        stop_t = time.time() + args.burn
        procs = [multiprocessing.Process(target=_burn, args=(stop_t,))
                 for _ in range(ncpu)]
        for p in procs:
            p.start()
        for p in procs:
            p.join()
        rate = (_steal_j() - s0) / args.burn
        print(f"probe: steal {rate:.1f} j/s (streak {streak})", flush=True)
        if rate < args.max_rate:
            streak += 1
            if streak >= args.need:
                print("window quiet", flush=True)
                return 0
        else:
            streak = 0
            time.sleep(args.cooldown)
    print("timeout waiting for quiet window", flush=True)
    return 1


if __name__ == "__main__":
    sys.exit(main())
