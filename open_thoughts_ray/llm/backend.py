"""LLM backends + shared rate limiting for the completions operator.

No LLM exists in this environment, so the default backend is a
DETERMINISTIC mock: every response is a pure function (md5) of the
canonical prompt text, so pipelines are reproducible and SQL-checkable
(DuckDB md5 over the same template reproduces the annotation column
bit-for-bit).  The actor-pool + shared-rate-limiter shape matches the
reference's curator-based operator (completions_operator.py:220-300:
a singleton actor shares the QPS budget across operators in online
mode); swapping in a real HTTP backend is implementing ``complete``.

Mock response rules by response_format tag (see llm.maps):
  None        → md5_hex(canonical)
  "score"     → {response: 1 + (ascii(h[0])·256 + ascii(h[1])) % 100,
                 reasoning: "mock-reasoning-" + h[:8]}
  "bool"      → {response: ascii(h[0]) % 2 == 0, reasoning: ...}
  "judgement" → "Mock judgement " + h[:8] + ".\n" + (yes|no by ascii(h[0])%2)
  "list:<n>"  → [md5_hex(canonical + "#" + str(i)) for i in range(n)]
where h = md5_hex(canonical) and canonical = "\n".join(role + "\n" +
content per message).
"""

from __future__ import annotations

import hashlib
import time


def canonical_prompt(messages: list[dict] | str) -> str:
    if isinstance(messages, str):
        messages = [{"role": "user", "content": messages}]
    return "\n".join(f"{m['role']}\n{m['content']}" for m in messages)


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class MockLLMBackend:
    """Deterministic seeded mock; see module docstring for the response
    rules (each is chosen to be reproducible in ANSI SQL)."""

    def __init__(self, fail_every: int = 0):
        #: fail_every=k makes every k-th request raise ONCE (retry path
        #: testing); retried requests succeed.
        self.fail_every = int(fail_every)
        self._calls = 0
        self._failed: set[str] = set()

    def complete(self, messages: list[dict] | str, response_format: str | None):
        self._calls += 1
        canonical = canonical_prompt(messages)
        if self.fail_every and self._calls % self.fail_every == 0 \
                and canonical not in self._failed:
            self._failed.add(canonical)
            raise TimeoutError("mock transient failure")
        h = _md5(canonical)
        if response_format is None:
            return h
        if response_format == "score":
            return {"response": 1 + (ord(h[0]) * 256 + ord(h[1])) % 100,
                    "reasoning": "mock-reasoning-" + h[:8]}
        if response_format == "bool":
            return {"response": ord(h[0]) % 2 == 0,
                    "reasoning": "mock-reasoning-" + h[:8]}
        if response_format == "judgement":
            verdict = "yes" if ord(h[0]) % 2 == 0 else "no"
            return f"Mock judgement {h[:8]}.\n{verdict}"
        if response_format.startswith("list:"):
            n = int(response_format.split(":", 1)[1])
            return [_md5(canonical + "#" + str(i)) for i in range(n)]
        if response_format == "difficulty":
            # rubric-graded int in [1, 10] (SkyT1 difficulty shape)
            return {"difficulty": 1 + (ord(h[0]) * 256 + ord(h[1])) % 10,
                    "reasoning": "mock-reasoning-" + h[:8]}
        if response_format.startswith("fields:"):
            # structured named string fields (unnatural_instructions_map
            # / alpaca_seed_task_map response models): one md5 per field
            names = response_format.split(":", 1)[1].split(",")
            return {f: _md5(canonical + "#field#" + f) for f in names}
        if response_format.startswith("tasklist:"):
            # list of structured {task, instruction, input, output}
            # items (open_gpt_map.py response model)
            n = int(response_format.split(":", 1)[1])
            return {"tasks": [
                {f: _md5(canonical + "#task" + str(i) + "#" + f)
                 for f in ("task", "instruction", "input", "output")}
                for i in range(n)]}
        if response_format.startswith("testcases:"):
            # structured {test_inputs, test_outputs} (test_case_map.py
            # TestCases shape): parallel md5 lists, SQL-reproducible
            n = int(response_format.split(":", 1)[1])
            return {
                "test_inputs": [_md5(canonical + "#in#" + str(i))
                                for i in range(n)],
                "test_outputs": [_md5(canonical + "#out#" + str(i))
                                 for i in range(n)],
            }
        if response_format.startswith("alpaca:"):
            # a self-instruct-style numbered completion the AlpacaMap
            # regex parser consumes: n "{idx}. Instruction/Input/Output:"
            # blocks joined by ###, content derived from md5 so DuckDB
            # replays the parsed rows bit-for-bit
            n, k = (int(x) for x in response_format.split(":")[1:3])
            blocks = []
            for i in range(1, n + 1):
                idx = k + i
                inst = _md5(canonical + "#inst#" + str(i))
                outp = _md5(canonical + "#out#" + str(i))
                lead = "" if i == 1 else f"{idx}. Instruction:"
                blocks.append(
                    f"{lead}\nSummarize topic {inst} briefly.\n"
                    f"{idx}. Input:\n<noinput>\n{idx}. Output:\n{outp}\n")
            return "###".join(blocks)
        if response_format == "judge_result":
            # {correct, reasoning} (DeepSeekR1/deepseek_judge.py
            # JudgeResult shape)
            return {"correct": ord(h[0]) % 2 == 0,
                    "reasoning": "mock-reasoning-" + h[:8]}
        if response_format.startswith("choices:"):
            # subset of candidate indices 0..n-1 + reasoning
            # (AutoVerification code/math/science "Same" maps: conlist
            # of Choices enums).  Index i is included iff the parity of
            # hex char h[i+1] is even — SQL: ascii(substr(h,i+2,1))%2=0.
            n = int(response_format.split(":", 1)[1])
            return {"response": [str(i) for i in range(n)
                                 if ord(h[i + 1]) % 2 == 0],
                    "reasoning": "mock-reasoning-" + h[:8]}
        if response_format.startswith("quantities:"):
            # list of {surrounding_context, inverse_question,
            # inverse_answer} (Metamath inverse_question_map.py
            # Quantities shape).  Even items pass the numeric+X parse
            # filter; odd items deterministically fail it.
            n = int(response_format.split(":", 1)[1])
            out = []
            for i in range(n):
                qh = _md5(canonical + "#q#" + str(i))
                if i % 2 == 0:
                    out.append({
                        "surrounding_context": qh[:16],
                        "inverse_question":
                            f"What is X plus {qh[:8]} ?",
                        "inverse_answer": str(int(h[i], 16)),
                    })
                else:
                    out.append({
                        "surrounding_context": qh[:16],
                        "inverse_question": f"What is {qh[:8]} ?",
                        "inverse_answer": "unknown",
                    })
            return {"quantities": out}
        if response_format.startswith("problems:"):
            # {problems: [{question, detailed_answer, answer}]}
            # (Metamath metamath_problem_generator.py GeneratedProblem).
            # Even items satisfy validate_problem (math indicator +
            # numeric answer); odd items fail it.
            n = int(response_format.split(":", 1)[1])
            probs = []
            for i in range(n):
                qh = _md5(canonical + "#p#" + str(i))
                if i % 2 == 0:
                    probs.append({
                        "question": f"Compute {qh[:8]} = X.",
                        "detailed_answer":
                            f"{qh[:8]} = {int(h[i], 16)}",
                        "answer": str(int(h[i], 16)),
                    })
                else:
                    probs.append({"question": qh[:8],
                                  "detailed_answer": qh[8:16],
                                  "answer": "none"})
            return {"problems": probs}
        if response_format.startswith("qapairs:"):
            # {qa_exists, extracted_qa_pairs} (WebInstruct
            # extract_qa_map.py ExtractedQAs shape).  qa_exists is h[0]
            # parity (75% true); pairs are per-index md5s.
            n = int(response_format.split(":", 1)[1])
            exists = ord(h[0]) % 4 != 1
            pairs = [] if not exists else [
                {"question": _md5(canonical + "#q#" + str(i)),
                 "answer": _md5(canonical + "#a#" + str(i))}
                for i in range(n)]
            return {"qa_exists": exists, "extracted_qa_pairs": pairs}
        if response_format.startswith("qalist:"):
            # {qas: [{question, answer}]} (Airoboros list_qa_map.py)
            n = int(response_format.split(":", 1)[1])
            return {"qas": [
                {"question": _md5(canonical + "#q#" + str(i)),
                 "answer": _md5(canonical + "#a#" + str(i))}
                for i in range(n)]}
        if response_format.startswith("boolfields:"):
            # structured named bool fields (e.g. WebInstruct
            # classify_educational_domain_map.py)
            names = response_format.split(":", 1)[1].split(",")
            return {f: ord(_md5(canonical + "#bool#" + f)[0]) % 2 == 0
                    for f in names}
        if response_format == "solve":
            # {solution, final_answer} (Metamath solve_inverse/
            # solve_rephrased Answer shape): final_answer echoes the
            # FIRST number in the prompt so answer-matching parse
            # filters exercise both branches deterministically.
            import re as _re

            m = _re.search(r"\d+(?:\.\d+)?", canonical)
            return {"solution": h,
                    "final_answer": m.group(0) if m else ""}
        if response_format.startswith("contextual:"):
            # {prompts: [{text_blocks: [{metadata, content}],
            # instruction}]} (Airoboros contextual_instructions_map.py)
            n = int(response_format.split(":", 1)[1])
            return {"prompts": [
                {"text_blocks": [{
                    "metadata": {
                        "date": _md5(canonical + "#d#" + str(i))[:10],
                        "author": _md5(canonical + "#au#" + str(i))[:10],
                    },
                    "content": _md5(canonical + "#c#" + str(i)),
                }],
                 "instruction": _md5(canonical + "#i#" + str(i))}
                for i in range(n)]}
        if response_format == "ranking":
            # candidates are numbered "[k] ..." in the prompt; emit a
            # deterministic permutation of 1..n seeded by the prompt hash
            import numpy as np

            n = canonical.count("\n[")
            rng = np.random.default_rng(int(h[:8], 16))
            return {"response": (rng.permutation(n) + 1).tolist()}
        raise ValueError(f"unknown response_format {response_format!r}")


class KeywordRubricBackend:
    """Deterministic teacher stand-in with a REAL signal: scorer
    prompts containing ``keyword`` get ``hi``, others ``lo`` — the
    planted rubric the distillation loop (distill.py) is tested
    against (a real backend swap changes nothing downstream)."""

    def __init__(self, keyword: str = "photosynthesis",
                 hi: float = 90.0, lo: float = 10.0):
        self.keyword = keyword
        self.hi = float(hi)
        self.lo = float(lo)

    def complete(self, messages, response_format):
        text = canonical_prompt(messages)
        score = self.hi if self.keyword in text else self.lo
        if response_format == "score":
            return {"response": score, "reasoning": "keyword-rubric"}
        if response_format == "bool":
            return {"response": score >= 50.0,
                    "reasoning": "keyword-rubric"}
        return str(score)


BACKENDS = {"mock": MockLLMBackend,
            "keyword_rubric": KeywordRubricBackend}


def register_backend(name: str, factory) -> None:
    BACKENDS[name] = factory


def build_backend(name, **kwargs):
    """``name`` is a registered backend name OR a picklable factory
    callable.  The callable form is the multi-node-safe way to inject a
    custom backend: the registry dict is a driver-side module global, so
    a ``register_backend`` call made after import is invisible to worker
    processes — a factory shipped inside the task closure is not."""
    if callable(name):
        return name(**kwargs)
    if name not in BACKENDS:
        raise KeyError(f"unknown backend '{name}'; registered: {sorted(BACKENDS)}")
    return BACKENDS[name](**kwargs)


def rate_limiter_actor():
    """Lazy @ray.remote class definition (module import must not require
    an initialized Ray)."""
    import ray

    @ray.remote(num_cpus=0)
    class RateLimiter:
        """Shared token bucket: requests/min + tokens/min, the
        reference's online-mode budget (completions_operator.py:284-296,
        herorun3_math.yaml:271-272).  ``acquire`` returns the seconds
        the caller must sleep before sending — state lives in ONE actor
        so every pool worker draws from the same budget."""

        def __init__(self, requests_per_min: float = 1e9,
                     tokens_per_min: float = 1e12):
            self.rpm = float(requests_per_min)
            self.tpm = float(tokens_per_min)
            self.req_allow = self.rpm  # burst capacity = 1 minute
            self.tok_allow = self.tpm
            self.last = time.monotonic()
            self.granted_requests = 0

        def acquire(self, n_requests: int, n_tokens: int) -> float:
            now = time.monotonic()
            dt = now - self.last
            self.last = now
            self.req_allow = min(self.rpm, self.req_allow + dt * self.rpm / 60.0)
            self.tok_allow = min(self.tpm, self.tok_allow + dt * self.tpm / 60.0)
            self.req_allow -= n_requests
            self.tok_allow -= n_tokens
            self.granted_requests += n_requests
            wait = 0.0
            if self.req_allow < 0:
                wait = max(wait, -self.req_allow * 60.0 / self.rpm)
            if self.tok_allow < 0:
                wait = max(wait, -self.tok_allow * 60.0 / self.tpm)
            return wait

        def stats(self) -> dict:
            return {"granted_requests": self.granted_requests}

    return RateLimiter


# Named limiters are keyed by their budget, so a handle must outlive
# the pipeline that created it — otherwise the (non-detached) named
# actor dies as soon as the actor pool tears down and a later pipeline
# re-creates it with a cold bucket.  The driver-process cache below
# pins one handle per name for the Ray session.
_LIMITER_HANDLES: dict = {}


def shared_rate_limiter(requests_per_min: float = 1e9,
                        tokens_per_min: float = 1e12, name: str | None = None):
    """Create (or fetch, when ``name`` given) the shared limiter actor —
    named get-if-exists mirrors the reference's CompletionsSingleton."""
    RateLimiter = rate_limiter_actor()
    if name:
        handle = _LIMITER_HANDLES.get(name)
        if handle is None:
            handle = RateLimiter.options(name=name, get_if_exists=True).remote(
                requests_per_min, tokens_per_min)
            _LIMITER_HANDLES[name] = handle
        return handle
    return RateLimiter.remote(requests_per_min, tokens_per_min)
