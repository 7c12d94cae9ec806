#!/usr/bin/env python3
"""Unit coverage for tools/compare.py's debt-first sweep ordering
(r14 verdict Next #2: the ordering must credit greens from all three
artifact kinds — driver CORRECTNESS_rN, builder CORRECTNESS_LOCAL_rN,
judge CORRECTNESS_JUDGE_rN — with driver greens outranking same-round
LOCAL/JUDGE greens). Plain-assert script, no test framework:

    python3 tools/test_compare.py
"""
import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))
import compare  # noqa: E402


def green(*names):
    return {n: {"rows_match": True, "schema_match": True,
                "hash_match": True, "spark_rows": 1, "oracle_rows": 1,
                "err": None} for n in names}


def red(*names):
    return {n: {"rows_match": True, "schema_match": True,
                "hash_match": False, "spark_rows": 1, "oracle_rows": 1,
                "err": None} for n in names}


def main():
    with tempfile.TemporaryDirectory() as td:
        repo = Path(td)
        # r13 driver artifact: q_a and q_b green, q_c red.
        (repo / "CORRECTNESS_r13.json").write_text(
            json.dumps({**green("q_a", "q_b"), **red("q_c")}))
        # r14 driver artifact: the empty {} failure mode on record.
        (repo / "CORRECTNESS_r14.json").write_text("{}")
        # r14 LOCAL twin: q_b, q_c, q_d green.
        (repo / "CORRECTNESS_LOCAL_r14.json").write_text(
            json.dumps(green("q_b", "q_c", "q_d")))
        # r14 JUDGE replica: q_c green (redundant with LOCAL for q_c).
        (repo / "CORRECTNESS_JUDGE_r14.json").write_text(
            json.dumps(green("q_c")))
        # A non-artifact file that must be ignored by the name filter.
        (repo / "CORRECTNESS_NOTES_r14.json").write_text(
            json.dumps(green("q_z")))

        g = compare.latest_green_round(repo)
        # Driver r13 green credits 13.0; LOCAL/JUDGE r14 credit 13.5.
        assert g["q_a"] == 13.0, g
        assert g["q_b"] == 13.5, g   # LOCAL r14 outranks driver r13
        assert g["q_c"] == 13.5, g   # r13 red row credits nothing
        assert g["q_d"] == 13.5, g   # LOCAL-only green still credits
        assert "q_z" not in g, g     # unknown artifact name ignored

        # Debt order: never-green first, then stalest credit, then
        # alphabetical within a band.
        order = compare.sweep_order(
            ["q_d", "q_c", "q_b", "q_a", "q_new2", "q_new1"], repo)
        assert order == ["q_new1", "q_new2", "q_a", "q_b", "q_c", "q_d"], order

        # REVERIFY forces a query back into the never-green band.
        old = compare.REVERIFY
        compare.REVERIFY = {"q_a"}
        try:
            order = compare.sweep_order(["q_a", "q_b", "q_new1"], repo)
            assert order == ["q_a", "q_new1", "q_b"], order
        finally:
            compare.REVERIFY = old

        # Driver green outranks a same-round LOCAL green.
        (repo / "CORRECTNESS_r14.json").write_text(json.dumps(green("q_b")))
        g = compare.latest_green_round(repo)
        assert g["q_b"] == 14.0 and g["q_c"] == 13.5, g

    # looks_oom: word-bounded OOM phrases only — a deterministic error
    # that merely mentions malloc-family symbols must NOT trigger the
    # 30 s backoff path (ADVICE r14).
    assert compare.looks_oom("DuckDB Out of Memory Error: ...")
    assert compare.looks_oom("std::bad_alloc")
    assert compare.looks_oom("cannot allocate memory")
    assert not compare.looks_oom(
        "Binder Error: function 'malloc_trim' does not exist")
    # word-bounded: a marker inside a longer word must not match
    assert not compare.looks_oom("Preallocation failed: invalid argument")
    assert compare.looks_oom("allocation failed: out of budget")
    assert not compare.looks_oom("column amount not found")
    assert not compare.looks_oom(None)
    # concatenated JVM/duckdb forms lowercase to ONE word — the
    # leading-boundary-only marker must catch them (ADVICE r15 #2)
    assert compare.looks_oom("java.lang.OutOfMemoryError: heap space")
    assert compare.looks_oom("OutOfMemoryException in oracle leg")
    assert compare.looks_oom("plain outofmemory text")
    # ...but not inside a longer word on the LEFT
    assert not compare.looks_oom("fakeoutofmemory is not a marker")

    # preflight_wait: waits only while below the floor, spends the
    # shared budget, stops when memory recovers or budget runs out;
    # a None reading (no /proc/meminfo) disables the gate entirely.
    readings = iter([1000, 1200, 9999])
    slept = []
    budget = {"s": 100}
    waited = compare.preflight_wait(
        budget, floor_mb=2600, step_s=15,
        mem_fn=lambda: next(readings), sleep_fn=slept.append)
    assert waited == 30 and slept == [15, 15], (waited, slept)
    assert budget["s"] == 70, budget
    budget = {"s": 20}
    waited = compare.preflight_wait(
        budget, floor_mb=2600, step_s=15,
        mem_fn=lambda: 100, sleep_fn=lambda s: None)
    assert waited == 20 and budget["s"] == 0, (waited, budget)
    waited = compare.preflight_wait(
        {"s": 100}, floor_mb=2600, step_s=15,
        mem_fn=lambda: None, sleep_fn=lambda s: (_ for _ in ()).throw(
            AssertionError("must not sleep when meminfo is unreadable")))
    assert waited == 0, waited

    print("test_compare: all assertions passed")


if __name__ == "__main__":
    main()
