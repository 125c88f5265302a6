"""THE one engine↔oracle comparison definition.

scripts/verify_driver.py (the per-round gate replica) and
tests/test_fuzz_parity.py (the hostile-corpus sweeps) previously each
carried their own copy of the normalization + compare logic, and the
copies had already drifted — the fuzz copies lacked the python-TYPE
check (the round-1 INT-vs-BIGINT value-hash failure class), so a
type-only regression would pass every fuzz test and still go red at
the real driver. One module, both consumers.

Semantics mirror the driver's hashing: floats rounded to 6 dp
(−0.0 → 0.0, NaN → the sentinel string so it compares equal to
itself), rows sorted order-insensitively, columns matched
case-insensitively by name, and python types compared exactly.
"""

from __future__ import annotations

import math


def norm_rows(rows, ncols):
    out = []
    for row in rows:
        vals = []
        for v in row[:ncols]:
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                else:
                    v = round(v, 6)
                    if v == 0:
                        v = 0.0  # -0.0 → 0.0
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


def compare(name, scols, srows, ocols, orows):
    """Returns a list of failure strings (empty = parity).

    srows: sequences in scols order; orows: sequences in ocols order.
    """
    if sorted(c.lower() for c in scols) != sorted(c.lower() for c in ocols):
        return [f"{name}: cols spark={scols} oracle={ocols}"]
    key = sorted(scols, key=str.lower)
    sorder = [scols.index(c) for c in key]
    oorder = [
        ocols.index(next(o for o in ocols if o.lower() == c.lower()))
        for c in key
    ]
    got = norm_rows([[r[i] for i in sorder] for r in srows], len(key))
    want = norm_rows([[r[i] for i in oorder] for r in orows], len(key))
    if len(got) != len(want):
        return [f"{name}: rows spark={len(got)} oracle={len(want)}"]
    fails = []
    mism = [(g, w) for g, w in zip(got, want) if g != w]
    if mism:
        fails.append(
            f"{name}: {len(mism)} value mismatches; first {mism[:3]}"
        )
    type_mism = [
        (g, w)
        for g, w in zip(got, want)
        if tuple(type(x) for x in g) != tuple(type(x) for x in w)
    ]
    if type_mism:
        fails.append(f"{name}: type mismatch; first {type_mism[:2]}")
    return fails
