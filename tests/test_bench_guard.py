"""bench.py's anti-artifact self-check (VERDICT r2 #1: BENCH_r02 recorded a
physically impossible 241k fps because block_until_ready did not fence
through the axon tunnel; bench.py now host-read-fences and refuses to print
implausible numbers)."""
import importlib.util
import os

import pytest

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)

# DSFVT: 11 sampled slices x 256 pixels x 4 channel substeps
DSFVT_SEQ_STEPS = 11 * 256 * 4


def test_rejects_broken_fence_capture():
    # BENCH_r02's actual capture: 0.012 s for 45056 dependent steps
    err = bench.check_plausible(0.012, DSFVT_SEQ_STEPS)
    assert err is not None and "fence" in err


def test_accepts_honest_capture():
    # round-2's honest driver-style run: ~6.8 s (601-624 fps at batch 256)
    assert bench.check_plausible(6.8, DSFVT_SEQ_STEPS) is None
    # round-1 capture: 1.229 s at batch 32
    assert bench.check_plausible(1.229, DSFVT_SEQ_STEPS) is None


def test_threshold_is_exactly_the_floor():
    floor = DSFVT_SEQ_STEPS * bench.MIN_SEC_PER_STEP
    assert bench.check_plausible(floor * 0.99, DSFVT_SEQ_STEPS) is not None
    assert bench.check_plausible(floor * 1.01, DSFVT_SEQ_STEPS) is None


@pytest.mark.parametrize("argv,msg", [
    (["--mesh", "4"], "--skip-baseline"),
    (["--mesh", "4", "--skip-baseline", "--batch", "10"], "divide evenly"),
    (["--mesh", "4", "--skip-baseline", "--batch", "12", "--probe"],
     "divide evenly"),
    (["--full-recompute", "--attn", "pallas"], "no effect"),
    # HBM gate (ADVICE r3): native bf16 caches at the b1024 default are ~2x
    # the int8 bytes (~17 GB > v5e's 16 GB); fp32 at b512 similarly
    (["--kv", "native"], "16 GB HBM"),
    (["--kv", "native", "--dtype", "float32", "--batch", "512"], "16 GB HBM"),
    (["--batch", "2048"], "16 GB HBM"),
])
def test_flag_validation_rejects_bad_combos(argv, msg, capsys, monkeypatch):
    """The mesh/full-recompute flag guards exit at argparse time (before any
    jax import), so misconfigured runs can't produce a mislabeled JSON."""
    monkeypatch.setattr("sys.argv", ["bench.py"] + argv)
    with pytest.raises(SystemExit) as ex:
        bench.main()
    assert ex.value.code == 2  # argparse error exit
    assert msg in capsys.readouterr().err
