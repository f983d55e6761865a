"""bench.py orchestration helpers (the driver's only perf capture path —
round 2 lost its number to an unguarded backend failure, VERDICT r2 missing #1)."""

import importlib.util
import sys
from pathlib import Path


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_mod", Path(__file__).parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["bench_mod"] = mod
    spec.loader.exec_module(mod)
    return mod


def test_parse_result_picks_last_metric_json():
    bench = _load_bench()
    out = "\n".join(
        [
            "some log line",
            '{"not_a_metric": 1}',
            '{"metric": "a", "value": 1.0}',
            "# trailing note",
            '{"metric": "b", "value": 2.0, "extra_rows": []}',
        ]
    )
    rec = bench._parse_result(out)
    assert rec["metric"] == "b"
    assert rec["value"] == 2.0


def test_parse_result_none_on_garbage():
    bench = _load_bench()
    assert bench._parse_result("no json here\n{broken") is None
    assert bench._parse_result("") is None
