"""Expected-results verification (eval-as-integration-test).

Rebuild of d2's `verify_results` used by the reference as its de-facto
regression gate (`/root/reference/model_training/train_net_video.py:404-405`,
`engine/defaults.py:586-591`): cfg.TEST.EXPECTED_RESULTS lists
(task, metric, expected, tolerance) tuples; after evaluation the actual
metrics must match within tolerance or the run fails.
"""
from __future__ import annotations

from typing import Dict, Mapping, Sequence


def verify_results(expected: Sequence, results: Mapping[str, float]) -> bool:
    """expected: iterable of (task, metric, value, tolerance). `task` is
    kept for config compatibility; metrics are looked up flat (our metric
    dicts are already per-dataset). Raises AssertionError on mismatch."""
    if not expected:
        return True
    ok = True
    lines = []
    for entry in expected:
        task, metric, value, tolerance = entry
        actual = results.get(metric)
        if actual is None:
            ok = False
            lines.append(f"{task}/{metric}: MISSING (expected {value})")
            continue
        passed = abs(actual - value) <= tolerance
        ok &= passed
        lines.append(
            f"{task}/{metric}: actual {actual:.4f}, expected {value:.4f} "
            f"+/- {tolerance:.4f} -> {'OK' if passed else 'FAIL'}"
        )
    report = "\n".join(lines)
    print("Results verification:\n" + report)
    if not ok:
        raise AssertionError("Result verification failed!\n" + report)
    return True
