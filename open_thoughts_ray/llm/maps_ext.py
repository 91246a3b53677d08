"""Domain CompletionsMap library — the rest of the reference's
registered map surface (engine/maps/map_registry.py:57-112), so any
reference YAML `map:` name resolves here too.

Families (reference file cited per class):

* DeepSeekR1        — deepseek_judge, code_golf_extractor, plus the
                      provider reasoner aliases (deepseek / kluster /
                      claude / grok / together_qwen) over ReasonerMap
* SkyT1             — per-domain difficulty rubrics over DifficultyMap
* AutoVerification  — code_same / math_same / science_same consensus
                      index-subset judges
* Metamath          — inverse-question generation, answer extraction,
                      problem cloning, self-verification rewrite,
                      rephrase, and the two solve-and-match filters
* AutoEvolInstruct  — instruction evolver, prompt evolver, trajectory
                      analysis (list-state columns threaded per row)
* WebInstruct       — extract_qa, revise_qa, educational-domain
                      classify, url_classify
* Airoboros         — contextual / counterfactual instruction packing,
                      list_qa, experience
* GeminiOCR         — image→text annotation (mock backend hashes the
                      image bytes; a real multimodal backend slots in
                      via register_backend)

Each map is prompt construction + response parsing only; execution is
the shared actor-pool completions operator (llm/completions.py).  The
mock backend (llm/backend.py) gives every response_format tag a
deterministic md5-derived value, so these maps are testable and (where
registered in __ray_entry__) SQL-oracle-checkable.
"""

from __future__ import annotations

import hashlib
import re

from .maps import (
    ChatMap,
    CompletionsMap,
    DifficultyMap,
    ReasonerMap,
    register_map,
)

# ---------------------------------------------------------------- DeepSeekR1


class DeepSeekJudgeMap(CompletionsMap):
    """Ground-truth correctness judge with structured {correct,
    reasoning} response (DeepSeekR1/deepseek_judge.py:14-79)."""

    response_format = "judge_result"

    def __init__(self, config: dict):
        self.ground_truth_column = config["ground_truth_column"]
        self.answer_column = config["answer_column"]
        self.correct_column = config.get("output_correct_column", "correct")
        self.reasoning_column = config.get("output_reasoning_column",
                                           "judge_reasoning")

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": "Judge whether the SOLUTION matches the "
                            "GROUND TRUTH SOLUTION.\n"
                            f"SOLUTION: {row[self.answer_column]}\n"
                            "GROUND TRUTH SOLUTION: "
                            f"{row[self.ground_truth_column]}"}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.correct_column: bool(response["correct"]),
                self.reasoning_column: str(response["reasoning"])}

    def output_fields(self) -> dict[str, str]:
        return {self.correct_column: "bool",
                self.reasoning_column: "string"}


class CodeGolfExtractorMap(CompletionsMap):
    """Rewrite a code-golf solution into a runnable stdin/stdout script
    (DeepSeekR1/code_golf_extractor.py:36-97: structured {code})."""

    SYSTEM_PROMPT = ("Rewrite the following code-golf solution as a "
                     "Python script reading one test case per stdin "
                     "line (comma-separated args) and printing one "
                     "output line per case. Reply with code only.")
    response_format = "fields:code"

    def __init__(self, config: dict):
        self.solution_column = config["input_solution_column"]
        self.code_column = config.get("output_code_column", "code")

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user", "content": row[self.solution_column]}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.code_column: str(response["code"])}

    def output_fields(self) -> dict[str, str]:
        return {self.code_column: "string"}


class _ProviderReasonerMap(ReasonerMap):
    """ReasonerMap with a provider-named default solution column — the
    shape shared by deepseek_reasoner.py:15-50, claude_reasoner.py:
    14-57, grok_reasoner.py and together_qwen.py (each differs only in
    which backend splits reasoning from content and the output column
    default)."""

    PROVIDER = "model"

    def __init__(self, config: dict):
        cfg = dict(config)
        key = f"output_{self.PROVIDER}_solution_column"
        cfg.setdefault("output_solution_column",
                       cfg.pop(key, f"{self.PROVIDER}_solution"))
        super().__init__(cfg)


class DeepSeekReasonerMap(_ProviderReasonerMap):
    PROVIDER = "deepseek"


class ClaudeReasonerMap(_ProviderReasonerMap):
    PROVIDER = "claude"


class GrokReasonerMap(_ProviderReasonerMap):
    PROVIDER = "grok"


class TogetherQwenMap(_ProviderReasonerMap):
    PROVIDER = "qwen"


for _n, _c in (("deepseek_judge", DeepSeekJudgeMap),
               ("code_golf_extractor", CodeGolfExtractorMap),
               ("deepseek_reasoner", DeepSeekReasonerMap),
               ("kluster_deepseek_reasoner", DeepSeekReasonerMap),
               ("claude_reasoner", ClaudeReasonerMap),
               ("grok_reasoner", GrokReasonerMap),
               ("together_qwen", TogetherQwenMap)):
    register_map(_n, _c)


# -------------------------------------------------------------------- SkyT1


class SkyT1MathDifficultyMap(DifficultyMap):
    """AoPS-anchored 1-10 math rubric (SkyT1/sky_t1_math_difficulty.py)."""

    DEFAULT_CRITERIA = ("Scale of 1-10 anchored to competition math: "
                        "1 = one-step arithmetic, 3 = AMC mid-range, "
                        "5 = AIME entry, 7 = olympiad qualifier, "
                        "10 = IMO final problem.")


class SkyT1ICPCDifficultyMap(DifficultyMap):
    """ICPC-anchored 1-10 programming rubric
    (SkyT1/sky_t1_ICPC_difficulty.py)."""

    DEFAULT_CRITERIA = ("Scale of 1-10 anchored to competitive "
                        "programming: 1 = straight simulation, 4 = one "
                        "standard algorithm, 7 = regional-final "
                        "combination of techniques, 10 = world-final "
                        "hardest slot.")


class SkyT1ScienceDifficultyMap(DifficultyMap):
    """Graduate-science-anchored 1-10 rubric
    (SkyT1/sky_t1_science_difficulty.py)."""

    DEFAULT_CRITERIA = ("Scale of 1-10 anchored to science coursework: "
                        "1 = recall fact, 4 = single-concept "
                        "quantitative problem, 7 = multi-concept "
                        "derivation, 10 = open research question.")


for _n, _c in (("sky_t1_math_difficulty", SkyT1MathDifficultyMap),
               ("sky_t1_ICPC_difficulty", SkyT1ICPCDifficultyMap),
               ("sky_t1_science_difficulty", SkyT1ScienceDifficultyMap)):
    register_map(_n, _c)


# ---------------------------------------------------------- AutoVerification


class _SameConsensusMap(CompletionsMap):
    """Functional-equivalence consensus judge: given a LIST column of
    candidate solutions, the model returns the indices of the largest
    functionally-equivalent subset plus reasoning (AutoVerification/
    code_verification.py:104-237 and the math/science twins — they
    differ only in the domain wording and input column name)."""

    DOMAIN = "solution"
    INPUT_KEY = "solutions_column"

    def __init__(self, config: dict):
        self.solutions_column = config[self.INPUT_KEY]
        self.question_column = config["question_column"]
        self.output_column = config["output_column"]
        self.ending_characters = int(config.get("ending_characters", 1000))
        self.num_responses = int(config.get("num_responses", 3))
        self.response_format = f"choices:{self.num_responses}"

    def prompt(self, row: dict) -> list[dict]:
        cands = row[self.solutions_column]
        lines = [f"Compare these candidate {self.DOMAIN}s to the "
                 "question and return the indices of the largest "
                 "subset that are functionally equivalent, plus your "
                 "reasoning.",
                 f"Question: {row[self.question_column]}"]
        for idx, cand in enumerate(cands):
            cand = str(cand)
            if self.ending_characters:
                cand = cand[-self.ending_characters:]
            lines.append(f"Solution {idx}:\n{cand}")
        return [{"role": "user", "content": "\n".join(lines)}]

    def parse(self, row: dict, response) -> dict:
        return {**row,
                self.output_column: [str(v) for v in response["response"]],
                "_judge_reasoning": str(response["reasoning"])}

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "list<string>",
                "_judge_reasoning": "string"}


class CodeSameMap(_SameConsensusMap):
    DOMAIN = "code sample"
    INPUT_KEY = "code_column"


class MathSameMap(_SameConsensusMap):
    DOMAIN = "math solution"
    INPUT_KEY = "math_column"


class ScienceSameMap(_SameConsensusMap):
    DOMAIN = "science answer"
    INPUT_KEY = "science_column"


for _n, _c in (("code_same", CodeSameMap), ("math_same", MathSameMap),
               ("science_same", ScienceSameMap)):
    register_map(_n, _c)


# ----------------------------------------------------------------- Metamath

_NUM_RE = re.compile(r"\d")
_SENT_RE = re.compile(r"(?<=[.!?])\s+")


def _has_digit(s: str) -> bool:
    return bool(_NUM_RE.search(s))


class InverseQuestionMap(CompletionsMap):
    """Replace numeric quantities with X to mint inverse QA pairs; keep
    only pairs whose answer is numeric and whose question contains a
    bare X token (Metamath/inverse_question_map.py:22-141)."""

    def __init__(self, config: dict):
        self.question_column = config["question_column"]
        self.out_q = config["output_inverse_question_column"]
        self.out_a = config["output_inverse_answer_column"]
        self.num_quantities = int(config.get("num_quantities", 3))
        self.response_format = f"quantities:{self.num_quantities}"

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system",
                 "content": "Extract numerical quantities from the "
                            "question and invert it by replacing each "
                            "with X; the inverse answer is the "
                            "replaced quantity."},
                {"role": "user", "content": row[self.question_column]}]

    def parse(self, row: dict, response) -> list[dict]:
        out = []
        for q in response["quantities"]:
            if _has_digit(str(q["inverse_answer"])) \
                    and "X" in str(q["inverse_question"]).split(" "):
                out.append({**row, self.out_q: str(q["inverse_question"]),
                            self.out_a: str(q["inverse_answer"])})
        return out

    def output_fields(self) -> dict[str, str]:
        return {self.out_q: "string", self.out_a: "string"}


class ExtractMathAnswerMap(CompletionsMap):
    """Pull the short numerical answer out of a detailed answer; drop
    rows whose extraction has no digit
    (Metamath/extract_math_answer_map.py:15-79)."""

    SYSTEM_PROMPT = ("Extract the short final numerical answer from "
                     "the detailed answer.")
    response_format = "fields:numerical_answer"

    def __init__(self, config: dict):
        self.detailed_answer_column = config["detailed_answer_column"]
        self.out = config["output_numerical_answer_column"]

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user",
                 "content": "Detailed answer: "
                            f"{row[self.detailed_answer_column]}"}]

    def parse(self, row: dict, response) -> list[dict]:
        ans = str(response["numerical_answer"])
        if _has_digit(ans):
            return [{**row, self.out: ans}]
        return []

    def output_fields(self) -> dict[str, str]:
        return {self.out: "string"}


class GenerateMathProblemMap(CompletionsMap):
    """Clone new problems in the style of a seed problem, validated for
    math indicators + numeric answers (Metamath/
    metamath_problem_generator.py:24-135).  The reference assigns
    sequential ids from a driver-side counter; a global counter is a
    scale bottleneck, so ids here are content-addressed
    (md5(question)) — unique, deterministic, order-independent."""

    MATH_INDICATORS = ("$", "=", "+", "-", "*", "/", "\\frac", "\\sqrt")

    def __init__(self, config: dict):
        self.question_column = config.get("question_column", "question")
        self.detailed_answer_column = config.get("detailed_answer_column",
                                                 "detailed_answer")
        self.answer_column = config.get("answer_column", "answer")
        self.num_problems = int(config.get("num_problems", 2))
        self.response_format = f"problems:{self.num_problems}"

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": "Generate new math problems in the style "
                            "of this seed problem.\n"
                            f"Question: {row[self.question_column]}\n"
                            "Detailed answer: "
                            f"{row[self.detailed_answer_column]}\n"
                            f"Answer: {row[self.answer_column]}"}]

    def _valid(self, q: str, da: str, a: str) -> bool:
        if not (q and da and a):
            return False
        has_math = any(ind in q or ind in da
                       for ind in self.MATH_INDICATORS)
        return has_math and _has_digit(a)

    def parse(self, row: dict, response) -> list[dict]:
        out = []
        for p in response["problems"]:
            q, da, a = (str(p["question"]), str(p["detailed_answer"]),
                        str(p["answer"]))
            if self._valid(q, da, a):
                out.append({"question": q, "detailed_answer": da,
                            "answer": a,
                            "question_id":
                                hashlib.md5(q.encode()).hexdigest()})
        return out

    def output_fields(self) -> dict[str, str]:
        return {"question": "string", "detailed_answer": "string",
                "answer": "string", "question_id": "string"}


class SelfVerificationMap(CompletionsMap):
    """Restate a question's final interrogative sentence as a
    declarative statement carrying the known answer, then ask for the
    unknown X (Metamath/self_vertification_map.py:44-128)."""

    response_format = "fields:statement"

    def __init__(self, config: dict):
        self.question_column = config["question_column"]
        self.answer_column = config["answer_column"]

    def prompt(self, row: dict) -> list[dict]:
        sentences = _SENT_RE.split(str(row[self.question_column]).strip())
        last = sentences[-1] if sentences else ""
        return [{"role": "system",
                 "content": "Rewrite the question as a declarative "
                            "statement that asserts the given answer."},
                {"role": "user",
                 "content": f"Question: {last}. The answer is "
                            f"{row[self.answer_column]}."}]

    def parse(self, row: dict, response) -> dict:
        sentences = _SENT_RE.split(str(row[self.question_column]).strip())
        base = " ".join(sentences[:-1])
        new_q = (f"{base} {response['statement']} What is the value of "
                 "the unknown variable X?")
        return {**row, self.question_column: new_q,
                "method": "self_verification"}

    def output_fields(self) -> dict[str, str]:
        return {"method": "string"}


class RephraseQuestionMap(CompletionsMap):
    """Reword a question without changing its answer
    (Metamath/rephrase_question_map.py:10-97)."""

    response_format = "fields:rephrased_question"

    def __init__(self, config: dict):
        self.question_column = config["question_column"]
        self.out = config["output_rephrased_question_column"]

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system",
                 "content": "Rephrase the question preserving its "
                            "meaning and answer."},
                {"role": "user",
                 "content": f"Question: {row[self.question_column]}"}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.out: str(response["rephrased_question"])}

    def output_fields(self) -> dict[str, str]:
        return {self.out: "string"}


class _SolveAndMatchMap(CompletionsMap):
    """Solve a question and keep the row only when the model's final
    answer string-matches the ground truth after stripping '$'
    (Metamath/solve_inverse_map.py:285-313 and
    solve_rephrased_map.py:215-239 share this filter)."""

    response_format = "solve"
    QUESTION_KEY = "question_column"
    TRUTH_KEY = "answer_column"

    def __init__(self, config: dict):
        self.question_column = config[self.QUESTION_KEY]
        self.truth_column = config[self.TRUTH_KEY]
        self.out = config["output_predicted_answer_column"]

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": f"Question: {row[self.question_column]} \n "
                            "A: Let's think step by step."}]

    def parse(self, row: dict, response) -> list[dict]:
        pred = str(response["final_answer"]).replace("$", "")
        truth = str(row[self.truth_column]).replace("$", "")
        if pred and pred == truth:
            return [{**row, self.out: str(response["solution"])}]
        return []

    def output_fields(self) -> dict[str, str]:
        return {self.out: "string"}


class SolveInverseMap(_SolveAndMatchMap):
    QUESTION_KEY = "inverse_question_column"
    TRUTH_KEY = "inverse_answer_column"


class SolveRephraseMap(_SolveAndMatchMap):
    QUESTION_KEY = "rephrased_question_column"
    TRUTH_KEY = "answer_column"


for _n, _c in (("metamath_inverse_question", InverseQuestionMap),
               ("metamath_extract_math_answer", ExtractMathAnswerMap),
               ("metamath_problem_clone", GenerateMathProblemMap),
               ("metamath_self_verification", SelfVerificationMap),
               ("metamath_rephrase_question", RephraseQuestionMap),
               ("metamath_solve_inverse", SolveInverseMap),
               ("metamath_solve_rephrased", SolveRephraseMap)):
    register_map(_n, _c)


# ---------------------------------------------------------- AutoEvolInstruct


class AutoEvolLLMMap(CompletionsMap):
    """One evolution step: apply the row's evol_prompt method to the
    LAST instruction in its trajectory and append the newly evolved
    instruction (AutoEvolInstruct/evol_llm_prompt.py:13-69; the
    trajectory is a list<string> column threaded through repeated
    applications of this map)."""

    response_format = "fields:finally_rewritten_instruction"

    def __init__(self, config: dict):
        self.evol_prompt_column = config.get("evol_prompt_column",
                                             "evol_prompt")
        self.trajectory_column = config.get(
            "trajectory_column", "finally_rewritten_instructions")

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": f"{row[self.evol_prompt_column]}\n"
                            "#Instruction#:\n"
                            f"{row[self.trajectory_column][-1]}"}]

    def parse(self, row: dict, response) -> dict:
        traj = list(row[self.trajectory_column])
        traj.append(str(response["finally_rewritten_instruction"]))
        return {**row, self.trajectory_column: traj}

    def output_fields(self) -> dict[str, str]:
        return {self.trajectory_column: "list<string>"}


class AutoTrajectoryAnalysisLLMMap(CompletionsMap):
    """Ask the model which evolution stages failed; land the free-text
    analysis in a feedback column (AutoEvolInstruct/
    evol_trajectory_analysis.py:14-66)."""

    response_format = None

    def __init__(self, config: dict):
        self.trajectory_column = config.get(
            "trajectory_column", "finally_rewritten_instructions")
        self.feedback_column = config.get("feedback_column", "feedback")

    def prompt(self, row: dict) -> list[dict]:
        lines = ["Identify the evolution stages below that failed to "
                 "increase complexity over the previous stage, with "
                 "case IDs and reasons."]
        for idx, instr in enumerate(row[self.trajectory_column]):
            lines.append(f"Instruction {idx + 1}: {instr}")
        return [{"role": "user", "content": "\n".join(lines)}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.feedback_column: str(response)}

    def output_fields(self) -> dict[str, str]:
        return {self.feedback_column: "string"}


class EvolPromptEvolverMap(CompletionsMap):
    """Optimize the evolution method itself from failure feedback
    (AutoEvolInstruct/evol_prompt_evolver.py:6-71).  The reference
    stores evol_prompt as a 1-element list; here it is a plain string
    column (the YAML surface passes strings)."""

    response_format = None

    def __init__(self, config: dict):
        self.evol_prompt_column = config.get("evol_prompt_column",
                                             "evol_prompt")
        self.feedback_column = config.get("feedback_column", "feedback")

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "user",
                 "content": f"{row[self.feedback_column]}\n"
                            "Optimize this instruction-evolving method "
                            "using the feedback, without reducing the "
                            "complexity increase it produces:\n"
                            f'"""\n{row[self.evol_prompt_column]}\n"""\n'
                            "Reply with only the new evolved prompt."}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.evol_prompt_column: str(response)}

    def output_fields(self) -> dict[str, str]:
        return {self.evol_prompt_column: "string"}


for _n, _c in (("auto_evol_llm", AutoEvolLLMMap),
               ("auto_evol_trajectory_analysis", AutoTrajectoryAnalysisLLMMap),
               ("auto_evol_prompt_evolver", EvolPromptEvolverMap)):
    register_map(_n, _c)


# -------------------------------------------------------------- WebInstruct


class ExtractQAMap(CompletionsMap):
    """Extract natural QA pairs from crawled text; zero rows when the
    model reports none exist (WebInstruct/extract_qa_map.py:8-76)."""

    SYSTEM_PROMPT = ("Extract natural question-answer pairs from the "
                     "document, ignoring ads and boilerplate; return "
                     "an empty list when none exist.")

    def __init__(self, config: dict):
        self.text_column = config["input_text_column"]
        self.out_q = config["output_question_column"]
        self.out_a = config["output_answer_column"]
        self.num_pairs = int(config.get("num_pairs", 2))
        self.response_format = f"qapairs:{self.num_pairs}"

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user", "content": row[self.text_column]}]

    def parse(self, row: dict, response) -> list[dict]:
        if not response["qa_exists"]:
            return []
        return [{**row, self.out_q: str(p["question"]),
                 self.out_a: str(p["answer"])}
                for p in response["extracted_qa_pairs"]]

    def output_fields(self) -> dict[str, str]:
        return {self.out_q: "string", self.out_a: "string"}


class ReviseQAMap(CompletionsMap):
    """Revise an extracted QA pair against its source document
    (WebInstruct/revise_qa_map.py:8-84: structured
    {revised_question, revised_answer})."""

    response_format = "fields:revised_question,revised_answer"

    def __init__(self, config: dict):
        self.q_col = config["input_question_column"]
        self.a_col = config["input_answer_column"]
        self.doc_col = config["input_source_document_column"]
        self.out_q = config["output_question_column"]
        self.out_a = config["output_answer_column"]

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system",
                 "content": "Revise the question and answer for "
                            "clarity and faithfulness to the source "
                            "document."},
                {"role": "user",
                 "content": f"Source Document: {row[self.doc_col]}\n"
                            f"Question: {row[self.q_col]}\n"
                            f"Answer: {row[self.a_col]}"}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.out_q: str(response["revised_question"]),
                self.out_a: str(response["revised_answer"])}

    def output_fields(self) -> dict[str, str]:
        return {self.out_q: "string", self.out_a: "string"}


class ClassifyEducationalDomainMap(CompletionsMap):
    """Structured bool educational-domain classification
    (WebInstruct/classify_educational_domain_map.py:9-67)."""

    SYSTEM_PROMPT = ("Classify whether the domain likely hosts "
                     "educational content (instruction materials, exam "
                     "problems, tutorials).")
    response_format = "boolfields:is_education_domain"

    def __init__(self, config: dict):
        self.domain_column = config["input_domain_column"]
        self.out = config["output_classification_column"]

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system", "content": self.SYSTEM_PROMPT},
                {"role": "user", "content": row[self.domain_column]}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.out: bool(response["is_education_domain"])}

    def output_fields(self) -> dict[str, str]:
        return {self.out: "bool"}


class URLClassifyMap(CompletionsMap):
    """Free-text educational-URL classification with the last-word
    yes/no protocol (WebInstruct/url_classify_map.py:17-103); keeps the
    full response as reasoning and optionally filters negatives."""

    SYSTEM_PROMPT = ("Classify the domain as educational or "
                     "non-educational. The last word you send must be "
                     '"yes" (educational) or "no" (non-educational).')
    response_format = "judgement"

    def __init__(self, config: dict):
        self.url_column = config["input_url_column"]
        self.system_message = config.get("input_classify_system_message",
                                         self.SYSTEM_PROMPT)
        self.decision_column = config.get(
            "output_classify_decision_column", "url_classification")
        self.reasoning_column = config.get(
            "output_classify_reasoning_column", "url_classification_full")
        self.filter_out_negative = bool(
            config.get("filter_out_negative_classifications", False))

    def prompt(self, row: dict) -> list[dict]:
        return [{"role": "system", "content": self.system_message},
                {"role": "user", "content": row[self.url_column]}]

    def parse(self, row: dict, response) -> dict | list[dict]:
        text = str(response)
        last = text.strip().split()[-1].lower() if text.strip() else ""
        last = "".join(c for c in last if c.isalpha())
        decision = last == "yes"
        if self.filter_out_negative and not decision:
            return []
        return {**row, self.decision_column: decision,
                self.reasoning_column: text}

    def output_fields(self) -> dict[str, str]:
        return {self.decision_column: "bool",
                self.reasoning_column: "string"}


for _n, _c in (("webinstruct_extract_qa", ExtractQAMap),
               ("webinstruct_revise_qa", ReviseQAMap),
               ("webinstruct_classify_educational_domain",
                ClassifyEducationalDomainMap),
               ("url_classify", URLClassifyMap)):
    register_map(_n, _c)


# ---------------------------------------------------------------- Airoboros


class ContextualInstructionsMap(ChatMap):
    """Pack generated text blocks + instruction into the BEGININPUT /
    BEGINCONTEXT / BEGININSTRUCTION prompt format, one output row per
    generated prompt (Airoboros/contextual_instructions_map.py:6-54)."""

    def __init__(self, config: dict):
        cfg = dict(config)
        self.num_prompts = int(cfg.pop("num_prompts", 2))
        super().__init__(cfg)
        self.response_format = f"contextual:{self.num_prompts}"

    def parse(self, row: dict, response) -> list[dict]:
        out = []
        for prompt in response["prompts"]:
            parts = []
            for block in prompt["text_blocks"]:
                parts.append("BEGININPUT\nBEGINCONTEXT\n")
                for key, value in block["metadata"].items():
                    parts.append(f"{key}: {value}\n")
                parts.append(f"ENDCONTEXT\n{block['content']}\nENDINPUT\n")
            parts.append(f"BEGININSTRUCTION\n{prompt['instruction']}\n"
                         "ENDINSTRUCTION\n")
            out.append({**row, self.output_column: "".join(parts)})
        return out

    def output_fields(self) -> dict[str, str]:
        return {self.output_column: "string"}


class CounterfactualContextualInstructionsMap(ContextualInstructionsMap):
    """Counterfactual variant — same packing, caller supplies a
    counterfactual-generation template (Airoboros/
    counterfactual_contextual_instructions_map.py:6-70)."""


class ListQAMap(ChatMap):
    """Structured QA-list fan-out to instruction/response columns
    (Airoboros/list_qa_map.py:6-59)."""

    def __init__(self, config: dict):
        cfg = dict(config)
        self.out_q = cfg.pop("output_instruction_column")
        self.out_a = cfg.pop("output_response_column")
        self.num_pairs = int(cfg.pop("num_pairs", 2))
        cfg.setdefault("output_column", "_unused")
        super().__init__(cfg)
        self.response_format = f"qalist:{self.num_pairs}"

    def parse(self, row: dict, response) -> list[dict]:
        return [{**row, self.out_q: str(qa["question"]),
                 self.out_a: str(qa["answer"])}
                for qa in response["qas"]]

    def output_fields(self) -> dict[str, str]:
        return {self.out_q: "string", self.out_a: "string"}


class ExperienceMap(ChatMap):
    """Structured {setting, instruction, experience}: setting and
    instruction are concatenated into the instruction column, the
    experience narrative becomes the response column
    (Airoboros/experience_map.py:6-50)."""

    def __init__(self, config: dict):
        cfg = dict(config)
        self.out_q = cfg.pop("output_instruction_column")
        self.out_a = cfg.pop("output_response_column")
        cfg.setdefault("output_column", "_unused")
        super().__init__(cfg)
        self.response_format = "fields:setting,instruction,experience"

    def parse(self, row: dict, response) -> dict:
        return {**row,
                self.out_q: f"{response['setting']}\n\n"
                            f"{response['instruction']}",
                self.out_a: str(response["experience"])}

    def output_fields(self) -> dict[str, str]:
        return {self.out_q: "string", self.out_a: "string"}


for _n, _c in (("contextual_instructions", ContextualInstructionsMap),
               ("counterfactual_contextual_instructions",
                CounterfactualContextualInstructionsMap),
               ("list_qa", ListQAMap), ("experience", ExperienceMap)):
    register_map(_n, _c)


# ---------------------------------------------------------------- GeminiOCR


class GeminiOCRMap(CompletionsMap):
    """Image → transcribed text (GeminiOCR/gemini_ocr.py:14-71).  A
    real multimodal backend would attach the image bytes to the
    request; the text-only mock hashes the bytes into the prompt so
    responses stay deterministic per image."""

    response_format = None

    def __init__(self, config: dict):
        self.image_column = config["input_image_column"]
        self.out = config.get("output_text_column", "ocr_text")

    def prompt(self, row: dict) -> list[dict]:
        img = row[self.image_column]
        digest = hashlib.md5(bytes(img)).hexdigest()
        return [{"role": "user",
                 "content": "Transcribe all text in the attached "
                            f"image. [image:{digest}]"}]

    def parse(self, row: dict, response) -> dict:
        return {**row, self.out: str(response)}

    def output_fields(self) -> dict[str, str]:
        return {self.out: "string"}


register_map("gemini_ocr", GeminiOCRMap)

# reference registers AlpacaSeedTaskMap under "alpaca_seed"
# (map_registry.py:60); the repo name is "alpaca_seed_task" — alias both.
from .maps import MAP_REGISTRY  # noqa: E402

register_map("alpaca_seed", MAP_REGISTRY["alpaca_seed_task"])
# reference registers TestCaseMap under "test_cases" (map_registry.py:71)
register_map("test_cases", MAP_REGISTRY["test_case"])
