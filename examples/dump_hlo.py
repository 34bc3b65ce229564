"""Dump the optimized HLO of the flagship scan step and print the ops the
profiler flagged (fusion.NNN / pad.NNN / convolution*), with their
source-location metadata, so profile hotspots map back to framework code.

Usage: python examples/dump_hlo.py [op-name-substring ...]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/brdfnerf_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from examples.profile_step import build_scan
    scan_fn, carry, scan_steps = build_scan()
    keys = jax.random.split(jax.random.PRNGKey(1), scan_steps)
    lowered = scan_fn.lower(carry, keys)
    txt = lowered.compile().as_text()
    path = "/tmp/flagship_scan_hlo.txt"
    with open(path, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB of HLO to {path}")

    wanted = sys.argv[1:] or ["fusion.545", "fusion.546", "fusion.549",
                              "fusion.550", "fusion.554", "fusion.514",
                              "pad.1302", "pad.1303", "pad.1267",
                              "multiply_subtract_fusion.5",
                              "convolution_convert_fusion.2",
                              "multiply_add_fusion.175",
                              "convolution_add_fusion.8"]
    for w in wanted:
        # find the definition line: "  %<name> = ..." or "  <name> = ..."
        pat = re.compile(rf"^\s*(?:ROOT )?%?{re.escape(w)} = .*$", re.M)
        m = pat.search(txt)
        print(f"\n==== {w} ====")
        if not m:
            print("  (not found)")
            continue
        line = m.group(0)
        meta = re.search(r"metadata=\{[^}]*\}", line)
        shape = re.search(rf"{re.escape(w)} = (\S+)", line)
        print(f"  shape: {shape.group(1) if shape else '?'}")
        print(f"  meta:  {meta.group(0)[:300] if meta else '(none)'}")
        # if it's a fusion, show its computation body op names
        cm = re.search(r"calls=(%?\S+)", line)
        if cm:
            comp = cm.group(1).rstrip(",")
            cpat = re.compile(rf"^{re.escape(comp.lstrip('%'))} " r"\{(.*?)^\}",
                              re.M | re.S)
            cb = cpat.search(txt)
            if cb:
                body = cb.group(1)
                ops = re.findall(r"= \S+ (\w+)\(", body)
                from collections import Counter
                print(f"  body ops: {Counter(ops).most_common(12)}")
                metas = set(re.findall(r'op_name="([^"]+)"', body))
                for mt in sorted(metas)[:8]:
                    print(f"    op_name: {mt[:160]}")


if __name__ == "__main__":
    main()
