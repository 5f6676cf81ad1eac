"""FIDELITY harness invariants: the cleaning chain repairs every
repairable OCR-noise class, unrepairable classes land in their designed
match class, and both sides beat the reference's published bar
(BASELINE.md: asset 74.9%, liability 75.7% PERFECT+BOUNDED)."""

from __future__ import annotations

from x17a5_spark.fidelity import run_fidelity

N = 1500
REPAIRABLE = {"glyph", "conjoin", "subtotal", "scaleerr"}


def _collect(df):
    out = {}
    for r in df.collect():
        out[(r["noise_class"], r["noise_side"])] = {
            "P": r["PERFECT MATCH"],
            "B": r["BOUNDED MATCH"],
            "G": r["GROSS MISMATCH"],
            "NF": r["NOT FOUND"],
        }
    return out


def _rate(keyed, pred):
    num = den = 0
    for (nc, side), c in keyed.items():
        tot = sum(c.values())
        den += tot
        num += pred(nc, side, c)
    return num / den


def test_fidelity_distributions(spark):
    out = run_fidelity(spark, N)
    a = _collect(out["asset_dist"])
    l = _collect(out["liab_dist"])

    for keyed, target_col in ((a, "asset"), (l, "liability")):
        # overall PERFECT+BOUNDED beats the reference bar by a margin
        overall = _rate(keyed, lambda nc, s, c: c["P"] + c["B"])
        assert overall >= 0.80, f"{target_col}: overall {overall:.3f}"
        for (nc, side), c in keyed.items():
            tot = sum(c.values())
            if tot == 0:
                continue
            if nc in REPAIRABLE or nc == "clean" or side != target_col:
                # repaired / untargeted: overwhelmingly PERFECT (rare
                # epsilon false positives of the reference's own
                # heuristic are tolerated)
                assert c["P"] / tot >= 0.95, (target_col, nc, side, c)
            elif nc == "digit":
                assert c["B"] / tot >= 0.90, (target_col, nc, side, c)
            else:  # droprow / bigdigit on the targeted side
                assert c["G"] / tot >= 0.90, (target_col, nc, side, c)

    # value fidelity: repairable classes reconstruct the exact values
    vf = {r["noise_class"]: (r["n_exact"], r["n"]) for r in out["value_fidelity"].collect()}
    for nc in REPAIRABLE | {"clean"}:
        e, tot = vf[nc]
        assert e / tot >= 0.95, (nc, e, tot)
