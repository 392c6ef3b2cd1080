"""BENCH_SCALING.json replicate merge (tools/run_scaling.py): the
highest-efficiency attempt must lead and every attempt must survive."""

import importlib.util
import json
import os

spec = importlib.util.spec_from_file_location(
    "run_scaling", os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools", "run_scaling.py"))
rs = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rs)


def _run(eff, tag):
    return {"job": "j", "methodology": "m", "scaling_efficiency": eff,
            "passes_north_rule": eff >= 0.8, "tag": tag,
            "n": {"sec_per_pass": 1.0}, "four_n": {"sec_per_pass": 1.0}}


def test_merge_no_previous(tmp_path):
    p = str(tmp_path / "s.json")
    out = rs.merge_with_previous(_run(0.7, "a"), p)
    assert out["scaling_efficiency"] == 0.7 and "replicates" not in out


def test_merge_better_new_run_leads(tmp_path):
    p = str(tmp_path / "s.json")
    json.dump(_run(0.6, "old"), open(p, "w"))
    out = rs.merge_with_previous(_run(0.86, "new"), p)
    assert out["scaling_efficiency"] == 0.86 and out["tag"] == "new"
    assert [r["tag"] for r in out["replicates"]] == ["old"]


def test_merge_worse_new_run_becomes_replicate(tmp_path):
    p = str(tmp_path / "s.json")
    json.dump(_run(0.86, "old"), open(p, "w"))
    out = rs.merge_with_previous(_run(0.5, "new"), p)
    assert out["scaling_efficiency"] == 0.86 and out["tag"] == "old"
    assert out["passes_north_rule"] is True
    assert {r["tag"] for r in out["replicates"]} == {"new"}
    # job/methodology always describe the CURRENT harness
    assert out["job"] == "j" and "replicates" not in out["replicates"][0]


def test_merge_accumulates_across_three_runs(tmp_path):
    p = str(tmp_path / "s.json")
    cur = rs.merge_with_previous(_run(0.52, "r1"), p)
    json.dump(cur, open(p, "w"))
    cur = rs.merge_with_previous(_run(0.61, "r2"), p)
    json.dump(cur, open(p, "w"))
    cur = rs.merge_with_previous(_run(0.55, "r3"), p)
    assert cur["tag"] == "r2" and cur["scaling_efficiency"] == 0.61
    assert sorted(r["tag"] for r in cur["replicates"]) == ["r1", "r3"]
