"""Regenerate the deterministic seed-0 synthetic PubChem-scale corpus
(data/pubchem10m_synthetic.txt) BIT-IDENTICALLY to
data.synthetic.write_pretrain_corpus, but ~4-5x faster: the generator's
RNG draw sequence is untouched; only the deterministic
parse_smiles(s, strict=False) validation calls are memoized (the filled
template space is ~25 scaffolds x 30^2 substituents, so the cache
saturates after a few thousand molecules).

Usage: python runs/gen_corpus10m.py [N] [path]
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import molclr_tpu.data.synthetic as syn

_orig_parse = syn.parse_smiles


@functools.lru_cache(maxsize=None)
def _cached(s: str, strict: bool):
    return _orig_parse(s, strict=strict)


def _parse(s, strict=True):
    return _cached(s, strict)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    path = sys.argv[2] if len(sys.argv) > 2 else \
        "data/pubchem10m_synthetic.txt"
    syn.parse_smiles = _parse
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    t0 = time.time()
    import numpy as np

    rng = np.random.RandomState(0)
    with open(path, "w", buffering=1 << 22) as f:
        for i in range(n):
            f.write(syn.random_smiles(rng) + "\n")
            if (i + 1) % 500_000 == 0:
                dt = time.time() - t0
                print(f"{i + 1} molecules in {dt:.0f}s "
                      f"({(i + 1) / dt:,.0f}/s)", flush=True)
    print(f"wrote {path}: {n} molecules in {time.time() - t0:.0f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
