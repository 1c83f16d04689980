"""256^3 device-entropy coverage on real TPU hardware (VERDICT r3 #4).

The reference's default chunk is 256^3 (utilities/sperr3d.cpp:174); the
device entropy path must cover that regime without cap fallback and stay
byte-identical to the host entropy engine.  The suite pins JAX to a CPU
mesh (conftest.py), so this test drives the real chip from a SUBPROCESS
with the CPU pin stripped — and skips cleanly when no TPU is reachable
(CI, dev boxes without the tunnel).
"""

import json
import os
import subprocess
import sys

import pytest


pytestmark = pytest.mark.slow  # JAX-compile-heavy (see pytest.ini)

_PROBE = "import jax; d = jax.devices(); print(d[0].platform)"

_SCRIPT = r"""
import json
import numpy as np
import sys

sys.path.insert(0, "__REPO__")
from sperr_tpu.parallel.batched import TpuCompressor3D
from sperr_tpu.runtime.device_bench import _smooth_field

vol = _smooth_field(256)[0]
tol = 1e-2
comp_w = TpuCompressor3D((256, 256, 256), (256, 256, 256), entropy="wave")
sw = comp_w.compress(vol, "pwe", tol)
comp_h = TpuCompressor3D((256, 256, 256), (256, 256, 256), entropy="host")
sh = comp_h.compress(vol, "pwe", tol)
print(
    "RESULT "
    + json.dumps(
        {
            "wave_chunks": comp_w.last_wave_chunks,
            "num_chunks": 1,
            "equal": bytes(sw) == bytes(sh),
            "bytes": len(sw),
        }
    )
)
"""


def _tpu_env():
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    return env


def _tpu_reachable(timeout_s: float = 120.0) -> bool:
    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE],
            timeout=timeout_s, capture_output=True, env=_tpu_env(),
        )
        return r.returncode == 0 and b"cpu" not in r.stdout
    except Exception:
        return False


def test_wave_256_device_coverage_and_byte_identity():
    if not _tpu_reachable():
        pytest.skip("no TPU reachable (tunnel down or CPU-only host)")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, "-c", _SCRIPT.replace("__REPO__", repo)],
        capture_output=True, timeout=3000, env=_tpu_env(), text=True,
    )
    assert r.returncode == 0, f"device run failed:\n{r.stderr[-2000:]}"
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("RESULT ")]
    assert lines, f"no RESULT line:\n{r.stdout[-1000:]}"
    res = json.loads(lines[-1][len("RESULT "):])
    # the production-dims chunk must ride the device entropy path AND match
    # the host engine byte for byte
    assert res["wave_chunks"] == res["num_chunks"], res
    assert res["equal"], res
    assert res["bytes"] > 0
