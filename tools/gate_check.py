"""Prove the bench perf gate trips on a deliberate slowdown (VERDICT r4 #6).

Forces the slow config (6-pass matmuls everywhere, scalar-whiten VJP and
structured F⁻¹ off — together a measured ~3× step-rate hit) and runs
bench.main(); the gate must exit non-zero. The numerics smoke is reused
from the session's real run (SMOKE.json) rather than re-executed — this
check targets the GATE, and re-running smoke under the slow config would
cost ~3 min of device time to validate numerics that only get MORE
accurate at 6-pass. Exit code 0 here means THE CHECK ITSELF failed
(the gate did not trip).
"""

import json
import sys

import vggp_tpu.config as config

config.MATMUL_PRECISION = "highest"
config.GRAD_MATMUL_PRECISION = "highest"
config.SCALAR_WHITEN_VJP = False
config.STRUCTURED_FINV = False

import bench  # noqa: E402

_prev_smoke = json.load(open("SMOKE.json"))
bench.smoke = lambda: _prev_smoke  # reuse this session's real smoke record

try:
    bench.main()
except SystemExit as e:
    print(f"gate check: bench exited {e.code} under deliberate slowdown "
          f"({'PASS' if e.code else 'FAIL — gate did not trip'})",
          file=sys.stderr)
    sys.exit(0 if e.code else 1)
print("gate check FAILED: bench completed without tripping the gate",
      file=sys.stderr)
sys.exit(1)
