"""Code-execution verification: run candidate solutions against their
test cases and keep/annotate by pass rate — the reference's rejection-
sampling judge (open_thoughts/code/judge.py:1-805) as an actor-pool
stage.  Protocol coverage (VERDICT r4 #8):

* **std protocol** (judge.py:398-466 ``execute_std_code``): stdin in,
  stdout compared through the reference's FULL normalization ladder
  (``compare_std_results`` judge.py:484-607 — stripped-string, then
  line-stripped, then elementwise float ``allclose``, then the
  set-based rungs: per-line word sets, order-insensitive line sets,
  and 3-decimal-rounded numeric sets).
* **call-based protocol** (judge.py:86-135, 301-388: ``fn_name`` in
  the test payload): the solution is exec'd ONCE, the target function
  resolved (module-level or a ``Solution`` class method, judge.py:
  203-239), called per test with ``fn(*inputs)``, and the return value
  compared with the reference's tuple→list and ``outputs[0]``-unwrap
  coercions (judge.py:344-368).
* **batched compile caching** (judge.py compiles once per solution,
  then loops tests): ALL of a solution's tests now run in ONE
  ``python -I`` subprocess — the source is compiled a single time and
  each test gets a fresh module namespace + redirected stdio + its own
  ``signal.alarm`` soft timeout, mirroring judge.py's in-process
  per-test alarms.  One subprocess per SOLUTION instead of per test.
* **richer verdicts** (judge.py EXECUTION_RESULTS): per-test verdict
  strings ``passed / wrong_answer / runtime_error / timeout /
  compile_error`` are emitted as a JSON ``verdicts`` column next to
  the aggregate pass columns.

Isolation: every solution still runs in a FRESH ``python -I``
subprocess (no user site, no env hooks) with hard resource limits
(CPU seconds, address space, output size) — crashes, hangs and OOMs
become per-row failures, never worker poison.

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

# In-subprocess harness: reads one JSON payload on stdin
# {"code", "protocol": "std"|"call", "fn_name", "inputs": [...],
#  "timeout": per-test soft seconds} and prints one JSON line per test:
# {"status": "ok"|"timeout"|"error", "out": <stdout or JSON-able rv>,
#  "err": "..."}.  Compile errors print a single {"status":
# "compile_error"} line.  Comparison happens in the PARENT so the
# normalization ladder stays in reviewed library code.
_HARNESS = r"""
import io, json, signal, sys

payload = json.loads(sys.stdin.read())
code = payload["code"]
proto = payload["protocol"]
tests = payload["inputs"]
soft = max(1, int(payload.get("timeout", 5)))
real_stdout = sys.stdout

def emit(obj):
    real_stdout.write(json.dumps(obj) + "\n")
    real_stdout.flush()

class _Alarm(Exception):
    pass

def _on_alarm(sig, frm):
    raise _Alarm()

signal.signal(signal.SIGALRM, _on_alarm)

def _restore(t):
    # judge.py:175-196 singleton-dict tests: JSON stringified the int
    # keys (and the parent's payload dump re-stringified them) —
    # restore here, after the final JSON hop
    if isinstance(t, dict):
        try:
            return {int(k): v for k, v in t.items()}
        except (ValueError, TypeError):
            return t
    return t

tests = [_restore(t) for t in tests]

try:
    compiled = compile(code, "<solution>", "exec")
except BaseException as e:
    emit({"status": "compile_error", "err": repr(e)[:300]})
    sys.exit(0)

fn = None
if proto == "call":
    ns = {}
    try:
        signal.alarm(soft)
        exec(compiled, ns)
        signal.alarm(0)
    except BaseException as e:
        signal.alarm(0)
        emit({"status": "compile_error", "err": repr(e)[:300]})
        sys.exit(0)
    name = payload.get("fn_name") or ""
    if name in ns:
        fn = ns[name]
    elif "Solution" in ns:  # judge.py:203-239 class-method resolution
        try:
            fn = getattr(ns["Solution"](), name)
        except BaseException as e:
            emit({"status": "compile_error", "err": repr(e)[:300]})
            sys.exit(0)
    if fn is None:
        emit({"status": "compile_error", "err": f"no function {name!r}"})
        sys.exit(0)

for t in tests:
    try:
        signal.alarm(soft)
        if proto == "call":
            rv = fn(*t)
            signal.alarm(0)
            if isinstance(rv, tuple):
                rv = list(rv)
            try:
                out = json.dumps(rv)
            except (TypeError, ValueError):
                out = json.dumps(repr(rv))
            emit({"status": "ok", "out": out})
        else:
            stdin_text = t if isinstance(t, str) else "\n".join(map(str, t))
            sys.stdin = io.StringIO(stdin_text)
            sys.stdout = io.StringIO()
            ns = {"__name__": "__main__"}
            try:
                exec(compiled, ns)
                signal.alarm(0)
                emit({"status": "ok", "out": sys.stdout.getvalue()})
            except SystemExit as e:
                signal.alarm(0)
                if e.code in (None, 0):
                    emit({"status": "ok", "out": sys.stdout.getvalue()})
                else:
                    emit({"status": "error", "err": f"exit {e.code}"})
            finally:
                sys.stdout = real_stdout
    except _Alarm:
        sys.stdout = real_stdout
        emit({"status": "timeout"})
    except BaseException as e:
        signal.alarm(0)
        sys.stdout = real_stdout
        emit({"status": "error", "err": repr(e)[:300]})
"""


def _normalize_output(s: str) -> list[str]:
    """Line-wise comparison with trailing-whitespace tolerance
    (judge.py's output normalization)."""
    return [line.rstrip() for line in s.strip().splitlines()]


def compare_std_outputs(got: str, expect) -> bool:
    """The reference's ``compare_std_results`` ladder (judge.py:
    484-607): stripped-string equality → stripped-line-list equality
    (blank lines dropped) → elementwise float ``allclose`` → the
    set-based rungs (judge.py:569-607 checks 4-6): per-line word-SET
    equality (order-insensitive within a line), then line-order-
    insensitive frozenset-of-words equality, then the same with every
    word parsed as a float rounded to 3 decimals."""
    if isinstance(expect, (list, tuple)):
        expect = "\n".join(str(x) for x in expect)
    if got.strip() == str(expect).strip():
        return True
    if _normalize_output(got) == _normalize_output(str(expect)):
        return True
    gl = [x.strip() for x in got.strip().splitlines() if x.strip()]
    el = [x.strip() for x in str(expect).strip().splitlines() if x.strip()]
    if gl == el:
        return True
    try:
        gf = [float(x) for line in gl for x in line.split()]
        ef = [float(x) for line in el for x in line.split()]
        if len(gf) == len(ef) and bool(np.allclose(gf, ef)):
            return True
    except (ValueError, TypeError):
        pass
    # judge.py:569-578 check 4: per-line word sets, positional
    gs = [set(line.split()) for line in gl]
    es = [set(line.split()) for line in el]
    if gs == es:
        return True
    # judge.py:583-596 check 5: line order also irrelevant
    if set(map(frozenset, gs)) == set(map(frozenset, es)):
        return True
    # judge.py:598-607 check 6: all-numeric words rounded to 3 dp
    try:
        gr = set(frozenset(round(float(t), 3) for t in s) for s in gs)
        er = set(frozenset(round(float(t), 3) for t in s) for s in es)
        return gr == er
    except (ValueError, TypeError):
        return False


def _deep_list(v):
    if isinstance(v, tuple):
        return [_deep_list(x) for x in v]
    if isinstance(v, list):
        return [_deep_list(x) for x in v]
    return v


def compare_call_result(got, expect) -> bool:
    """Call-based comparison with the reference's coercions
    (judge.py:344-368): tuple→list, and accepting ``outputs[0]`` when
    the ground truth wraps the answer in a singleton list."""
    got = _deep_list(got)
    expect = _deep_list(expect)
    if got == expect:
        return True
    if isinstance(expect, list) and expect and got == expect[0]:
        return True
    return False


def run_solution(code: str, stdin_text: str, timeout_s: float = 5.0,
                 mem_bytes: int = 512 * 1024 * 1024,
                 max_output: int = 1 << 20) -> tuple[str, str]:
    """(stdout, error) of one subprocess run; error "" on clean exit.
    Single-test convenience path; the batched judge is verify_one."""

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


def _run_harness(code: str, protocol: str, fn_name: str | None,
                 inputs: list, timeout_s: float,
                 mem_bytes: int = 512 * 1024 * 1024) -> list[dict]:
    """One fresh ``python -I`` per SOLUTION: compile once, run every
    test inside with per-test soft alarms.  Returns one status dict per
    test (padded with timeouts if the whole process dies)."""

    wall = max(2.0, timeout_s * max(1, len(inputs)) + 2.0)

    def limits():
        import resource

        cpu = max(1, int(wall))
        resource.setrlimit(resource.RLIMIT_CPU, (cpu, cpu))
        try:
            resource.setrlimit(resource.RLIMIT_AS, (mem_bytes, mem_bytes))
        except ValueError:
            pass

    payload = json.dumps({"code": code, "protocol": protocol,
                          "fn_name": fn_name, "inputs": inputs,
                          "timeout": timeout_s})
    try:
        proc = subprocess.run(
            [sys.executable, "-I", "-c", _HARNESS], input=payload,
            capture_output=True, text=True, timeout=wall,
            preexec_fn=limits)
        lines = proc.stdout.splitlines()
    except subprocess.TimeoutExpired as e:
        lines = (e.stdout or b"").decode() if isinstance(
            getattr(e, "stdout", None), bytes) else (e.stdout or "")
        lines = lines.splitlines() if lines else []
    except Exception as e:
        return [{"status": "error", "err": f"spawn: {e}"}] * len(inputs)
    results = []
    for ln in lines:
        try:
            results.append(json.loads(ln))
        except json.JSONDecodeError:
            continue
    if results and results[0].get("status") == "compile_error":
        return [results[0]] * max(1, len(inputs))
    while len(results) < len(inputs):  # process died mid-suite
        results.append({"status": "timeout"})
    return results[:len(inputs)]


def _process_input_output(inputs, outputs):
    """judge.py:175-196 — JSON forces dict keys to strings; restore the
    int keys of singleton-dict tests."""
    try:
        if inputs and isinstance(inputs[0], dict):
            inputs = [{int(k): v for k, v in inputs[0].items()}]
    except (ValueError, TypeError, AttributeError):
        pass
    try:
        if isinstance(outputs, dict):
            outputs = [{int(k): v for k, v in outputs.items()}]
    except (ValueError, TypeError, AttributeError):
        pass
    try:
        if outputs and isinstance(outputs[0], dict):
            outputs = [{int(k): v for k, v in outputs[0].items()}]
    except (ValueError, TypeError, AttributeError):
        pass
    return inputs, outputs


def verify_one(code: str, test_cases: dict, timeout_s: float = 5.0) -> dict:
    """Run ``code`` against its test payload — the reference's
    test-case JSON layout (code/standardize.py:49-62), both protocols:
    ``fn_name`` present → call-based, else stdin/stdout."""
    inputs = test_cases.get("inputs", [])
    outputs = test_cases.get("outputs", [])
    inputs, outputs = _process_input_output(list(inputs), list(outputs))
    fn_name = test_cases.get("fn_name")
    protocol = "call" if fn_name else "std"
    n = min(len(inputs), len(outputs))
    if n == 0:
        return {"n_tests": 0, "n_passed": 0, "passed": False,
                "error": "", "verdicts": []}
    statuses = _run_harness(code, protocol, fn_name, inputs[:n], timeout_s)
    verdicts = []
    first_error = ""
    passed = 0
    for i, st in enumerate(statuses):
        s = st.get("status")
        if s == "ok":
            if protocol == "call":
                try:
                    got = json.loads(st.get("out", "null"))
                except json.JSONDecodeError:
                    got = st.get("out")
                ok = compare_call_result(got, outputs[i])
            else:
                ok = compare_std_outputs(st.get("out", ""), outputs[i])
            if ok:
                passed += 1
                verdicts.append("passed")
            else:
                verdicts.append("wrong_answer")
                first_error = first_error or f"case {i}: wrong answer"
        elif s == "timeout":
            verdicts.append("timeout")
            first_error = first_error or f"case {i}: timeout"
        elif s == "compile_error":
            verdicts.append("compile_error")
            first_error = first_error or \
                f"compile: {st.get('err', '')}"
        else:
            verdicts.append("runtime_error")
            first_error = first_error or \
                f"case {i}: {st.get('err', 'runtime error')}"
    return {"n_tests": n, "n_passed": passed,
            "passed": passed == n, "error": first_error,
            "verdicts": verdicts}


class CodeVerifier:
    """Actor: parse-once config; per batch runs each row's solution.

    Row contract: ``code_col`` = solution source, ``tests_col`` =
    JSON string (or struct) with inputs/outputs lists and an optional
    ``fn_name`` (call-based protocol)."""

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
                                    "passed": False, "error": "bad test json",
                                    "verdicts": []})
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
        out = out.append_column(
            "verdicts", pa.array([json.dumps(r["verdicts"]) for r in results],
                                 pa.string()))
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
