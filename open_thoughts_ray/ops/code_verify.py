"""Code-execution verification: run candidate solutions against their
test cases and keep/annotate by pass rate — the reference's rejection-
sampling judge (open_thoughts/code/judge.py:73-340: stdin/stdout tests,
per-test timeout, output normalization) as an actor-pool stage.

Isolation: every solution runs in a FRESH ``python -I`` subprocess
(isolated mode: no user site, no env hooks) with hard resource limits
(CPU seconds, address space, output size) — the judge pattern for
untrusted generated code, matching the reference's multiprocessing +
timeout_decorator sandbox with OS-level limits instead.  One row never
poisons the worker: crashes, hangs and OOMs become per-row failures.

Scale shape: verification is embarrassingly parallel and CPU-bound →
``map_batches(CodeVerifier, concurrency=N, num_cpus=1)``; test-case
payloads stay inside the row (no shuffle).
"""

from __future__ import annotations

import json
import subprocess
import sys

import numpy as np
import pyarrow as pa


def _normalize_output(s: str) -> list[str]:
    """Line-wise comparison with trailing-whitespace tolerance
    (judge.py's output normalization)."""
    return [line.rstrip() for line in s.strip().splitlines()]


def run_solution(code: str, stdin_text: str, timeout_s: float = 5.0,
                 mem_bytes: int = 512 * 1024 * 1024,
                 max_output: int = 1 << 20) -> tuple[str, str]:
    """(stdout, error) of one subprocess run; error "" on clean exit."""

    def limits():
        import resource

        cpu = max(1, int(timeout_s) + 1)
        resource.setrlimit(resource.RLIMIT_CPU, (cpu, cpu))
        try:
            resource.setrlimit(resource.RLIMIT_AS, (mem_bytes, mem_bytes))
        except ValueError:
            pass

    try:
        proc = subprocess.run(
            [sys.executable, "-I", "-c", code],
            input=stdin_text, capture_output=True, text=True,
            timeout=timeout_s, preexec_fn=limits,
        )
    except subprocess.TimeoutExpired:
        return "", "timeout"
    except Exception as e:  # spawn failure
        return "", f"spawn: {e}"
    if proc.returncode != 0:
        return proc.stdout[:max_output], f"exit {proc.returncode}: " + \
            proc.stderr[-500:]
    return proc.stdout[:max_output], ""


def verify_one(code: str, test_cases: dict, timeout_s: float = 5.0) -> dict:
    """Run ``code`` against {"inputs": [...], "outputs": [...]} —
    the reference's test-case JSON layout (code/standardize.py:49-62)."""
    inputs = test_cases.get("inputs", [])
    outputs = test_cases.get("outputs", [])
    n = min(len(inputs), len(outputs))
    passed = 0
    first_error = ""
    for i in range(n):
        stdin_text = inputs[i] if isinstance(inputs[i], str) else "\n".join(
            map(str, inputs[i]))
        expect = outputs[i] if isinstance(outputs[i], str) else "\n".join(
            map(str, outputs[i]))
        out, err = run_solution(code, stdin_text, timeout_s)
        if err:
            first_error = first_error or f"case {i}: {err}"
            continue
        if _normalize_output(out) == _normalize_output(expect):
            passed += 1
        else:
            first_error = first_error or f"case {i}: wrong answer"
    return {"n_tests": n, "n_passed": passed,
            "passed": n > 0 and passed == n, "error": first_error}


class CodeVerifier:
    """Actor: parse-once config; per batch runs each row's solution.

    Row contract: ``code_col`` = solution source, ``tests_col`` =
    JSON string (or struct) with inputs/outputs lists."""

    def __init__(self, code_col: str = "solution", tests_col: str = "test_cases",
                 timeout_s: float = 5.0, mode: str = "annotate"):
        self.code_col = code_col
        self.tests_col = tests_col
        self.timeout_s = timeout_s
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        codes = batch.column(self.code_col).to_pylist()
        tests = batch.column(self.tests_col).to_pylist()
        results = []
        for c, t in zip(codes, tests):
            if isinstance(t, str):
                try:
                    t = json.loads(t)
                except (json.JSONDecodeError, TypeError):
                    results.append({"n_tests": 0, "n_passed": 0,
                                    "passed": False, "error": "bad test json"})
                    continue
            results.append(verify_one(c or "", t or {}, self.timeout_s))
        out = batch
        out = out.append_column(
            "passed", pa.array([r["passed"] for r in results], pa.bool_()))
        out = out.append_column(
            "n_passed", pa.array([r["n_passed"] for r in results], pa.int64()))
        out = out.append_column(
            "n_tests", pa.array([r["n_tests"] for r in results], pa.int64()))
        out = out.append_column(
            "verify_error", pa.array([r["error"] for r in results], pa.string()))
        if self.mode == "filter":
            mask = np.asarray([r["passed"] for r in results], dtype=bool)
            return out.filter(pa.array(mask))
        return out


def verify_code(ds, code_col: str = "solution", tests_col: str = "test_cases",
                timeout_s: float = 5.0, mode: str = "annotate",
                concurrency: int | tuple = 4, num_cpus: float = 1.0):
    """Annotate (or filter to) rows whose solution passes every test."""
    return ds.map_batches(
        CodeVerifier, batch_format="pyarrow", batch_size=64,
        concurrency=concurrency, num_cpus=num_cpus,
        fn_constructor_kwargs=dict(code_col=code_col, tests_col=tests_col,
                                   timeout_s=timeout_s, mode=mode),
    )
