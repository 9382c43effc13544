"""bench.py backend-down replay fallback (`_replay_last_capture`).

Host-only logic: when the axon backend never answers, the driver bench
re-emits the recovery campaign's own TPU-captured JSON (provenance-labeled)
instead of exiting with no artifact. These tests pin the parsing contract
for both capture sources (a raw bench.log line and a CAMPAIGN_r4.md
backtick-wrapped report row) and the no-capture / bad-capture refusals.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


GOOD = {
    "metric": "badnets_smallcnn_train_throughput",
    "value": 46549.6,
    "unit": "clips/sec/chip",
    "vs_baseline": 584.42,
    "detail": {"workloads": {"smallcnn_float32": {"clips_per_sec": 46549.6}}},
}


def _run(capsys, candidates):
    ok = bench._replay_last_capture(candidates=candidates)
    out = capsys.readouterr().out
    return ok, out


def test_replays_bench_log_line(tmp_path, capsys):
    log = tmp_path / "bench.log"
    log.write_text("devices: [TpuDevice(id=0)]\n" + json.dumps(GOOD) + "\n")
    ok, out = _run(capsys, [str(log)])
    assert ok
    payload = json.loads(out)
    assert payload["value"] == GOOD["value"]
    assert payload["metric"] == GOOD["metric"]
    # provenance label must be present so the artifact is honest about itself
    assert payload["detail"]["replayed_capture"]["source"] == str(log)


def test_replays_campaign_report_row(tmp_path, capsys):
    report = tmp_path / "CAMPAIGN.md"
    report.write_text(
        "| time | stage | status | duration | note |\n"
        "|---|---|---|---|---|\n"
        f"| 2026-08-18 08:00:00 | bench_json | OK | - | `{json.dumps(GOOD)}` |\n"
    )
    ok, out = _run(capsys, [str(report)])
    assert ok
    payload = json.loads(out)
    assert payload["value"] == GOOD["value"]
    assert payload["detail"]["replayed_capture"]["source"] == str(report)


def test_no_capture_refuses(tmp_path, capsys):
    empty = tmp_path / "bench.log"
    empty.write_text("backend probe timed out\n")
    ok, out = _run(capsys, [str(tmp_path / "missing.log"), str(empty)])
    assert not ok
    assert out == ""  # nothing printed — caller exits rc 1


def test_non_numeric_value_refuses(tmp_path, capsys):
    log = tmp_path / "bench.log"
    bad = dict(GOOD, value=None)
    log.write_text(json.dumps(bad) + "\n")
    ok, out = _run(capsys, [str(log)])
    assert not ok
    assert out == ""


def test_smoke_capture_refuses(tmp_path, capsys):
    # A BENCH_SMOKE rehearsal (tiny shapes, detail.smoke=true) must never be
    # replayed as evidence — fall through to later candidates or refuse.
    log = tmp_path / "bench.log"
    smoke = dict(GOOD, detail={"smoke": True, "workloads": {}})
    log.write_text(json.dumps(smoke) + "\n")
    ok, out = _run(capsys, [str(log)])
    assert not ok
    assert out == ""


def test_smoke_skipped_but_real_capture_used(tmp_path, capsys):
    smoke_log = tmp_path / "bench.log"
    smoke_log.write_text(json.dumps(dict(GOOD, detail={"smoke": True})) + "\n")
    real = tmp_path / "CAMPAIGN.md"
    real.write_text(f"| x | bench_json | OK | - | `{json.dumps(GOOD)}` |\n")
    ok, out = _run(capsys, [str(smoke_log), str(real)])
    assert ok
    payload = json.loads(out)
    assert payload["value"] == GOOD["value"]
    assert payload["detail"]["replayed_capture"]["source"] == str(real)


def test_prefers_first_candidate(tmp_path, capsys):
    first = tmp_path / "bench.log"
    second = tmp_path / "CAMPAIGN.md"
    first.write_text(json.dumps(dict(GOOD, value=51400.0)) + "\n")
    second.write_text(f"| x | bench_json | OK | - | `{json.dumps(GOOD)}` |\n")
    ok, out = _run(capsys, [str(first), str(second)])
    assert ok
    assert json.loads(out)["value"] == 51400.0
