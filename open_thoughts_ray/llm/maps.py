"""CompletionsMap plugin surface — the reference's prompt/parse registry
(engine/maps/base_map.py:4-33, map_registry.py:57-112) re-expressed for
Ray Data batch execution.

A map turns a dataset row into an LLM request and a response back into
one-or-more rows; the executor (llm.completions) runs maps inside an
actor pool over Arrow batches.  Implemented maps mirror the reference's
core family:

* ChatMap              — {{column}} template filling (chat_map.py:29-51)
* BinaryClassifierMap  — bool + reasoning (binary_classifier_map.py:13-36)
* ScorerMap            — bounded score + reasoning (scorer_map.py:8-36)
* JudgeMap             — yes/no verdict, last-word protocol (judge_map.py:30-60)
* ListMap              — structured list response fanned out to rows
                         (list_map.py:28-42)

Register custom maps with ``register_map`` (the reference's
COMPLETIONS_MAPS dict).  Configs are plain dicts — validated in
``__init__`` — so maps serialize cleanly into Ray actor constructors.
"""

from __future__ import annotations

import re
from abc import ABC, abstractmethod

_TEMPLATE_RE = re.compile(r"\{\{(\w+)\}\}")


def fill_template(template: str, row: dict) -> str:
    """Replace ``{{column}}`` patterns with row values (chat_map.py:29-51)."""
    return _TEMPLATE_RE.sub(lambda m: str(row[m.group(1)]), template)


class CompletionsMap(ABC):
    """prompt(row) → messages; parse(row, response) → row | list[row]."""

    #: response-format tag understood by the backend:
    #: None (free text), "score", "bool", "judgement", "list:<n>"
    response_format: str | None = None

    @abstractmethod
    def prompt(self, row: dict) -> list[dict] | str:
        """Messages ``[{role, content}, ...]`` (or bare user string)."""

    @abstractmethod
    def parse(self, row: dict, response) -> dict | list[dict]:
        """New row(s); returning a list fans out (ListMap semantics)."""

    def output_fields(self) -> dict[str, str]:
        """Columns this map ADDS to a row → logical type name
        ("string" | "bool" | "float64" | "list<string>" | "list<int64>").
        Used to emit correctly-typed zero-row batches when every row of a
        batch is dropped (ADVICE r2: an input-schema empty block next to
        output-schema blocks breaks downstream select_columns/concat)."""
        return {}


class ChatMap(CompletionsMap):
    """Template-filled single-turn chat; response lands in output_column."""

    response_format = None

    def __init__(self, config: dict):
        self.user_message = config.get("user_message")
        self.user_message_column = config.get("user_message_column")
        self.system_message = config.get("system_message")
        self.system_message_column = config.get("system_message_column")
        self.output_column = config["output_column"]
        if bool(self.user_message) == bool(self.user_message_column):
            raise ValueError("exactly one of user_message / user_message_column")
        if self.system_message and self.system_message_column:
            raise ValueError("only one of system_message / system_message_column")

    def prompt(self, row: dict) -> list[dict]:
        messages = []
        sys_msg = None
        if self.system_message:
            sys_msg = fill_template(self.system_message, row)
        elif self.system_message_column:
            sys_msg = row[self.system_message_column]
        if sys_msg:
            messages.append({"role": "system", "content": sys_msg})
        if self.user_message:
            user = fill_template(self.user_message, row)
        else:
            user = row[self.user_message_column]
            if user is None:
                raise ValueError("null user message column")
        messages.append({"role": "user", "content": user})
        return messages

    def parse(self, row: dict, response) -> dict:
        return {**row, self.output_column: response}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "string"}


class BinaryClassifierMap(ChatMap):
    """Structured bool verdict + reasoning (binary_classifier_map.py:13-36)."""

    response_format = "bool"

    def parse(self, row: dict, response) -> dict:
        return {**row, self.output_column: bool(response["response"]),
                "classifier_reasoning": response["reasoning"]}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "bool", "classifier_reasoning": "string"}


class ScorerMap(ChatMap):
    """Structured score in [1, 100] + reasoning (scorer_map.py:8-36)."""

    response_format = "score"

    def parse(self, row: dict, response) -> dict:
        score = float(response["response"])
        if not 1.0 <= score <= 100.0:
            raise ValueError(f"score out of range: {score}")
        return {**row, self.output_column: score,
                "classifier_reasoning": response["reasoning"]}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "float64", "classifier_reasoning": "string"}


class JudgeMap(CompletionsMap):
    """Correctness judge: free-text reasoning ending in yes/no
    (judge_map.py:30-60 last-word protocol)."""

    response_format = "judgement"

    DEFAULT_SYSTEM = (
        "Evaluate whether the attempt correctly answers the inputs given "
        "the targets. End your response with a single word: yes or no."
    )

    def __init__(self, config: dict):
        self.input_instruction_column = config["input_instruction_column"]
        self.input_golden_answer_column = config["input_golden_answer_column"]
        self.input_attempt_answer_column = config["input_attempt_answer_column"]
        self.system_message = config.get("input_judge_system_message",
                                         self.DEFAULT_SYSTEM)
        self.decision_column = config.get("output_judgement_decision_column",
                                          "model_judgement")
        self.reasoning_column = config.get("output_judgement_reasoning_column",
                                           "model_judgement_full")
        self.filter_out_negative = config.get("filter_out_negative_judgements",
                                              False)

    def prompt(self, row: dict) -> list[dict]:
        user = (
            f"inputs: {row[self.input_instruction_column]}\n"
            f"targets: {row[self.input_golden_answer_column]}\n"
            f"attempt: {row[self.input_attempt_answer_column]}"
        )
        return [{"role": "system", "content": self.system_message},
                {"role": "user", "content": user}]

    def parse(self, row: dict, response) -> dict | list[dict]:
        text = str(response)
        last = text.strip().split()[-1].lower().strip(".") if text.strip() else ""
        decision = last == "yes"
        if self.filter_out_negative and not decision:
            return []
        return {**row, self.decision_column: decision,
                self.reasoning_column: text}

    def output_fields(self) -> dict[str, str]:
        return {self.decision_column: "bool", self.reasoning_column: "string"}


class ListMap(ChatMap):
    """Structured list response fanned out into one row per item
    (list_map.py:28-42).  ``num_items`` bounds the mock backend's list."""

    def __init__(self, config: dict):
        super().__init__(config)
        self.num_items = int(config.get("num_items", 3))
        self.response_format = f"list:{self.num_items}"

    def parse(self, row: dict, response) -> list[dict]:
        return [{**row, self.output_column: item} for item in response]

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "string"}


MAP_REGISTRY: dict[str, type[CompletionsMap]] = {}


def register_map(name: str, cls: type[CompletionsMap]) -> None:
    """Plugin hook (reference COMPLETIONS_MAPS, map_registry.py:57-112)."""
    MAP_REGISTRY[name] = cls


for _n, _c in (("chat", ChatMap), ("binary_classifier", BinaryClassifierMap),
               ("scorer", ScorerMap), ("judge", JudgeMap), ("list", ListMap)):
    register_map(_n, _c)


def build_map(kind: str, config: dict) -> CompletionsMap:
    if kind not in MAP_REGISTRY:
        raise KeyError(f"unknown completions map '{kind}'; "
                       f"registered: {sorted(MAP_REGISTRY)}")
    return MAP_REGISTRY[kind](config)


class RankerMap(CompletionsMap):
    """Rank N candidate responses for a query → permutation list
    (ranker_map.py:23-80: numbered candidates in the prompt, structured
    list-of-int response stored in output_column)."""

    def __init__(self, config: dict):
        self.query_column = config["query_column"]
        self.responses_column = config["responses_column"]
        self.system_prompt = config.get(
            "system_prompt", "You are a helpful assistant who ranks multiple answers")
        self.output_column = config["output_column"]
        self.response_format = "ranking"

    def prompt(self, row: dict) -> list[dict]:
        cands = row[self.responses_column]
        body = f"Rank the following {len(cands)} responses to: " \
               f"{row[self.query_column]}\n"
        for j, c in enumerate(cands):
            body += f"\n[{j + 1}] {c}"
        return [{"role": "system", "content": self.system_prompt},
                {"role": "user", "content": body}]

    def parse(self, row: dict, response) -> dict:
        ranking = [int(x) for x in response["response"]]
        n = len(row[self.responses_column])
        if sorted(ranking) != list(range(1, n + 1)):
            raise ValueError(f"invalid ranking {ranking} for {n} candidates")
        return {**row, self.output_column: ranking}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "list<int64>"}


class CriticMap(CompletionsMap):
    """Critique N candidate responses (critic_map.py:16-60: numbered
    candidates, free-text critique in output_column)."""

    response_format = None

    def __init__(self, config: dict):
        self.query_column = config["query_column"]
        self.responses_column = config["responses_column"]
        self.system_prompt = config.get("system_prompt",
                                        "You are a critical evaluator")
        self.output_column = config["output_column"]

    def prompt(self, row: dict) -> list[dict]:
        cands = row[self.responses_column]
        body = ("Evaluate the strengths and weaknesses of each response "
                f"based on the instruction: {row[self.query_column]}.\n")
        for j, c in enumerate(cands):
            body += f"\n[{j + 1}] {c}"
        return [{"role": "system", "content": self.system_prompt},
                {"role": "user", "content": body}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.output_column: response}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "string"}


class FuserMap(CompletionsMap):
    """Fuse the top-ranked candidates into one response
    (fuser_map.py:23-90: takes the ranking column, prompts with the top
    ``top_ranking`` candidates, free-text fused answer)."""

    response_format = None

    def __init__(self, config: dict):
        self.query_column = config["query_column"]
        self.responses_column = config["responses_column"]
        self.ranking_column = config["ranking_column"]
        self.top_ranking = int(config.get("top_ranking", 5))
        self.system_prompt = config.get(
            "system_prompt", "You are a helpful assistant who fuses multiple answers")
        self.output_column = config["output_column"]

    def prompt(self, row: dict) -> list[dict]:
        cands = row[self.responses_column]
        ranking = row[self.ranking_column]
        top = [cands[r - 1] for r in ranking[: self.top_ranking]]
        body = (f"Fuse the best ideas of the following {len(top)} responses "
                f"to: {row[self.query_column]}\n")
        for j, c in enumerate(top):
            body += f"\n[{j + 1}] {c}"
        return [{"role": "system", "content": self.system_prompt},
                {"role": "user", "content": body}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.output_column: response}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "string"}


for _n, _c in (("ranker", RankerMap), ("critic", CriticMap),
               ("fuser", FuserMap)):
    register_map(_n, _c)


class GeneratorMap(ListMap):
    """ListMap variant that keeps the structured list response as ONE
    row with a list<string> column instead of fanning out
    (generator_map.py:4-26: "turned into one single row in the
    dataset")."""

    def parse(self, row: dict, response) -> dict:
        return {**row, self.output_column: list(response)}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "list<string>"}


class TestCaseMap(CompletionsMap):
    """Structured test-case generation for coding problems
    (test_case_map.py:1-70: system prompt + problem → parallel
    test_inputs / test_outputs string lists attached to the row)."""

    SYSTEM_PROMPT = (
        "You generate test cases for programming problems: reply with "
        "equally sized lists of stdin inputs and expected outputs, one "
        "string each; use a comma between multiple values and an empty "
        "string when the program reads nothing.")

    def __init__(self, config: dict):
        self.prompt_column = config["input_prompt_column"]
        self.inputs_column = config.get("output_test_inputs_column",
                                        "test_inputs")
        self.outputs_column = config.get("output_test_outputs_column",
                                         "test_outputs")
        self.num_cases = int(config.get("num_cases", 3))
        self.response_format = f"testcases:{self.num_cases}"

    def prompt(self, row: dict) -> list[dict]:
        return [
            {"role": "system", "content": self.SYSTEM_PROMPT},
            {"role": "user",
             "content": "Write test cases for this problem:\n\n"
                        f"{row[self.prompt_column]}"},
        ]

    def parse(self, row: dict, response) -> dict:
        ins = list(response["test_inputs"])
        outs = list(response["test_outputs"])
        if len(ins) != len(outs):
            raise ValueError("test_inputs and test_outputs must be "
                             f"parallel: {len(ins)} vs {len(outs)}")
        return {**row, self.inputs_column: ins, self.outputs_column: outs}

    def output_fields(self) -> dict[str, str]:
        return {self.inputs_column: "list<string>",
                self.outputs_column: "list<string>"}


class AlpacaMap(CompletionsMap):
    """Self-instruct instruction generation (alpaca_map.py:19-109): the
    completion continues a numbered few-shot prompt with
    ``{idx}. Instruction: / Input: / Output:`` blocks separated by
    ``###``; parse splits the blocks, normalizes ``<noinput>``, and
    applies the quality heuristics (length bounds, modality-word
    blacklist, punctuation/ascii lead) before emitting one row per
    surviving instruction."""

    #: modality/task words a text-only model cannot satisfy
    #: (alpaca_map.py:71-92 heuristics)
    BLACKLIST = ("image", "images", "graph", "graphs", "picture",
                 "pictures", "file", "files", "map", "maps", "draw",
                 "plot", "go to", "video", "audio", "music",
                 "flowchart", "diagram")

    def __init__(self, config: dict):
        self.prompt_column = config["alpaca_prompt_column"]
        self.instruction_column = config.get("output_instruction_column",
                                             "instruction")
        self.input_column = config.get("output_input_column", "instr_input")
        self.output_column = config.get("output_output_column", "output")
        self.num_seed = int(config.get("num_seed_instructions", 3))
        self.num_generated = int(config.get("num_generated", 2))
        self.response_format = f"alpaca:{self.num_generated}:{self.num_seed}"
        self._block_re = None  # compiled lazily per worker

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user", "content": row[self.prompt_column]}]

    def _keep(self, inst: str) -> bool:
        import re
        import string

        words = inst.split()
        if len(words) <= 3 or len(words) > 150:
            return False
        low = inst.lower()
        if any(re.search(rf"\b{re.escape(w)}\b", low)
               for w in self.BLACKLIST):
            return False
        if inst.startswith("Write a program"):
            return False
        if not inst or inst[0] in string.punctuation or not inst[0].isascii():
            return False
        return True

    def parse(self, row: dict, response) -> list[dict]:
        import re

        text = f"{self.num_seed + 1}. Instruction:" + response
        out_rows = []
        for offset, block in enumerate(text.split("###")):
            idx = self.num_seed + 1 + offset
            parts = re.split(
                rf"{idx}\.\s+(Instruction|Input|Output):", block)
            if len(parts) != 7:
                continue
            inst = parts[2].strip()
            inp = parts[4].strip()
            if inp.lower() == "<noinput>":
                inp = ""
            outp = parts[6].strip()
            if not self._keep(inst):
                continue
            out_rows.append({**row,
                             self.instruction_column: inst,
                             self.input_column: inp,
                             self.output_column: outp})
        return out_rows

    def output_fields(self) -> dict[str, str]:
        return {self.instruction_column: "string",
                self.input_column: "string",
                self.output_column: "string"}


for _n, _c in (("generator", GeneratorMap), ("test_case", TestCaseMap),
               ("alpaca", AlpacaMap)):
    register_map(_n, _c)


class UnnaturalInstructionsMap(ChatMap):
    """Structured {instruction, input, constraints} triple appended to
    the row (unnatural_instructions_map.py:16-57: Pydantic response with
    three coerced-to-str fields)."""

    def __init__(self, config: dict):
        cfg = dict(config)
        self.instruction_column = cfg.pop("output_instruction_column",
                                          "instruction")
        self.input_column = cfg.pop("output_input_column", "instr_input")
        self.constraints_column = cfg.pop("output_constraints_column",
                                          "constraints")
        cfg.setdefault("output_column", "_unused")
        super().__init__(cfg)
        self.response_format = "fields:instruction,input,constraints"

    def parse(self, row: dict, response) -> dict:
        return {**row,
                self.instruction_column: str(response["instruction"]),
                self.input_column: str(response["input"]),
                self.constraints_column: str(response["constraints"])}

    def output_fields(self) -> dict[str, str]:
        return {self.instruction_column: "string",
                self.input_column: "string",
                self.constraints_column: "string"}


class AlpacaSeedTaskMap(ChatMap):
    """Seed-task variant generation (alpaca_seed_task_map.py:14-44):
    the structured {instruction, input, output} response becomes a NEW
    row and the original seed row is kept alongside it — a 2× fan-out.
    The input rows must already carry the three columns (the reference
    applies this to the alpaca seed-task table, which does)."""

    def __init__(self, config: dict):
        cfg = dict(config)
        cfg.setdefault("output_column", "_unused")
        super().__init__(cfg)
        self.response_format = "fields:instruction,input,output"

    def parse(self, row: dict, response) -> list[dict]:
        variant = {**row,
                   "instruction": str(response["instruction"]),
                   "input": str(response["input"]),
                   "output": str(response["output"])}
        return [variant, dict(row)]

    def output_fields(self) -> dict[str, str]:
        return {"instruction": "string", "input": "string",
                "output": "string"}


for _n, _c in (("unnatural_instructions", UnnaturalInstructionsMap),
               ("alpaca_seed_task", AlpacaSeedTaskMap)):
    register_map(_n, _c)


class OpenGPTMap(ChatMap):
    """Structured task LIST fan-out (open_gpt_map.py:17-65): the
    response is a list of {task, instruction, input, output} items, one
    output row per item."""

    def __init__(self, config: dict):
        cfg = dict(config)
        self.num_tasks = int(cfg.pop("num_tasks", 2))
        cfg.setdefault("output_column", "_unused")
        super().__init__(cfg)
        self.response_format = f"tasklist:{self.num_tasks}"

    def parse(self, row: dict, response) -> list[dict]:
        return [{**row,
                 "task": str(t["task"]),
                 "instruction": str(t["instruction"]),
                 "input": str(t["input"]),
                 "output": str(t["output"])}
                for t in response["tasks"]]

    def output_fields(self) -> dict[str, str]:
        return {"task": "string", "instruction": "string",
                "input": "string", "output": "string"}


register_map("open_gpt", OpenGPTMap)


class DifficultyMap(CompletionsMap):
    """Rubric-graded integer difficulty (SkyT1 difficulty family,
    SkyT1/sky_t1_math_difficulty.py:52-100: structured {difficulty,
    reasoning} against a grading rubric).  ``criteria`` is the rubric
    text (callers supply their domain's scale; the default is a plain
    1-10 description) and the response is validated into [1, 10]."""

    DEFAULT_CRITERIA = ("Scale of 1-10: 1 = routine exercise anyone can "
                        "do, 5 = requires several non-obvious steps, "
                        "10 = research-level or historically hard.")
    response_format = "difficulty"

    def __init__(self, config: dict):
        self.problem_column = config["problem_column"]
        self.difficulty_column = config.get("output_difficulty_column",
                                            "difficulty")
        self.reasoning_column = config.get("output_reasoning_column",
                                           "difficulty_reasoning")
        self.criteria = config.get("criteria", self.DEFAULT_CRITERIA)

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": "Grade the difficulty from 1-10 using this "
                            f"standard: {self.criteria}\n"
                            f"Problem: {row[self.problem_column]}"}]

    def parse(self, row: dict, response) -> dict:
        d = int(response["difficulty"])
        if not 1 <= d <= 10:
            raise ValueError(f"difficulty out of range: {d}")
        return {**row, self.difficulty_column: d,
                self.reasoning_column: str(response["reasoning"])}

    def output_fields(self) -> dict[str, str]:
        return {self.difficulty_column: "int64",
                self.reasoning_column: "string"}


class ReasonerMap(CompletionsMap):
    """Reasoning-model annotation (DeepSeekR1/deepseek_reasoner.py:21-50):
    the backend returns separate reasoning and final-answer texts, landed
    in two columns."""

    response_format = "fields:reasoning,content"

    def __init__(self, config: dict):
        self.problem_column = config["input_problem_column"]
        self.solution_column = config.get("output_solution_column",
                                          "solution")
        self.reasoning_column = config.get("output_reasoning_column",
                                           "reasoning")

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user", "content": row[self.problem_column]}]

    def parse(self, row: dict, response) -> dict:
        return {**row,
                self.reasoning_column: str(response["reasoning"]),
                self.solution_column: str(response["content"])}

    def output_fields(self) -> dict[str, str]:
        return {self.reasoning_column: "string",
                self.solution_column: "string"}


for _n, _c in (("difficulty", DifficultyMap), ("reasoner", ReasonerMap)):
    register_map(_n, _c)
