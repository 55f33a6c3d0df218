"""tools/analyze_matrix.py — the measurement-session summarizer must pair
runs with their JSON lines across both bench schemas and flag crashed
configs (a silently dropped config would skew the BASELINE.md update)."""
import importlib.util
import os
import subprocess
import sys

_spec = importlib.util.spec_from_file_location(
    "analyze_matrix",
    os.path.join(os.path.dirname(__file__), "..", "tools", "analyze_matrix.py"))
am = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(am)

BENCH_JSON = ('{"metric": "frames/sec/chip ...", "value": 776.7, '
              '"unit": "frames/sec", "vs_baseline": null, "detail": '
              '{"batch": 256, "gen_seconds_median": 3.626, '
              '"gen_seconds_min": 3.602, "gen_seconds_max": 3.63, '
              '"kv_cache": "int8", "weights": "native", "mm": "native", '
              '"seg": 16, "attn": "xla"}}')
SAMPLE_JSON = ('{"config": "DSSVT.yaml", "batch": 512, "kv": "int8", '
               '"seg": 16, "mm": "native", "attn": "pallas", "n_prime": 5, '
               '"seconds_median": 9.1, "seconds_min": 9.0, '
               '"seconds_max": 9.3, "frames_per_sec_per_chip": 619.2}')


def _log(tmp_path, body):
    p = tmp_path / "matrix.log"
    p.write_text(body)
    return str(p)


def test_pairs_runs_across_both_schemas(tmp_path):
    path = _log(tmp_path, "\n".join([
        "=== 10:00:00 python bench.py --skip-baseline",
        "warmup noise",
        BENCH_JSON,
        "=== rc=0 python bench.py --skip-baseline",
        "=== 10:30:00 python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 512",
        SAMPLE_JSON,
        "=== rc=0 python tools/bench_sample.py --config configs/vt/DSSVT.yaml --batch 512",
        "",
    ]))
    runs = am.parse(path)
    assert len(runs) == 2
    assert runs[0]["json"]["value"] == 776.7 and runs[0]["rc"] == 0
    assert runs[1]["json"]["frames_per_sec_per_chip"] == 619.2


def test_flags_crashed_run_and_nonzero_exit(tmp_path):
    path = _log(tmp_path, "\n".join([
        "=== 10:00:00 python bench.py --skip-baseline",
        BENCH_JSON,
        "=== rc=0 python bench.py --skip-baseline",
        "=== 10:20:00 python bench.py --skip-baseline --attn pallas",
        "Traceback (most recent call last):",
        "  boom",
        "=== rc=1 python bench.py --skip-baseline --attn pallas",
        "",
    ]))
    proc = subprocess.run([sys.executable, am.__file__ if hasattr(am, "__file__")
                           else "tools/analyze_matrix.py", path],
                          capture_output=True, text=True,
                          cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert proc.returncode == 2  # crashed config present
    assert "NO JSON" in proc.stdout and "boom" in proc.stdout
    assert "776.7" in proc.stdout


def test_clean_log_exits_zero(tmp_path):
    path = _log(tmp_path, "\n".join([
        "=== 10:00:00 python bench.py --skip-baseline",
        BENCH_JSON,
        "=== rc=0 python bench.py --skip-baseline",
        "",
    ]))
    root = os.path.join(os.path.dirname(__file__), "..")
    proc = subprocess.run([sys.executable,
                           os.path.join(root, "tools", "analyze_matrix.py"),
                           path],
                          capture_output=True, text=True, cwd=root)
    assert proc.returncode == 0
    assert "1/1 runs produced JSON" in proc.stdout
