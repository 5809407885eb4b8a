"""Pluggable LLM response-generation backends — reference R2
(`generate_gpt_response` / `generate_mistral_response`,
`rag_search/vector_db.py:768-901`) behind the engine's batched inference
slot (`operators.rag.answer_prompts`).

A backend is a plain executor-side function `list[str] -> list[str]`
(assembled prompts in, responses out) so `answer_prompts` can wrap any of
them in the SAME mapInPandas stage: identical plan, identical
(query_id, response) schema, swappable by config. Clients/models are
cached per worker process (reused across Arrow batches and tasks),
unlike the reference's one-call-per-query loop.

Only `stub` is on the correctness path (deterministic first-100-token
summary — the token cap mirrors the reference's ``max_new_tokens=100`` at
`:830`). The real backends raise NotImplementedError at the exact line
the model call plugs in when their libraries are absent. Backend names
follow the reference's response-model routing keys (`vector_db.py:40-64`
— including the `local-mistral-3` name its own validation quirk §2.9.1
could never accept).
"""

# NOTE: no `from __future__ import annotations` — see functions/backends.py.

from typing import Callable

from pyspark.sql import SparkSession

GEN_CONF_KEY = "spark.vector_database_app_spark.llm.backend"

#: System prompt mirrored from the reference (`vector_db.py:822,888`).
SYSTEM_PROMPT = (
    "You are a helpful assistant that is going to summarize the key "
    "points from search results, based on a user query and relevant "
    "retrieved content."
)

#: Worker-global client/model cache (same mechanism as
#: functions.backends._WORKER_MODELS).
_WORKER_MODELS: dict = {}


def stub_generate(prompts: list) -> list:
    """Deterministic stand-in: first 100 whitespace tokens of the prompt
    (cap mirrors the reference's max_new_tokens=100)."""
    return [" ".join((p or "").split()[:100]) for p in prompts]


def gpt_generate(prompts: list) -> list:
    """Reference `generate_gpt_response` (`vector_db.py:838-901`): gpt-4o
    chat completion per prompt, stripped — batched here only by client
    reuse (the chat API has no multi-prompt batch)."""
    client = _WORKER_MODELS.get("openai-chat")
    if client is None:
        try:
            from openai import OpenAI  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - lib absent here
            raise NotImplementedError(
                "backend requires the openai client; not installed in "
                "this environment"
            ) from e
        client = OpenAI()  # pragma: no cover
        _WORKER_MODELS["openai-chat"] = client  # pragma: no cover
    out = []  # pragma: no cover
    for p in prompts:  # pragma: no cover
        completion = client.chat.completions.create(
            model="gpt-4o",
            messages=[
                {"role": "system", "content": SYSTEM_PROMPT},
                {"role": "user", "content": p},
            ],
        )
        out.append(completion.choices[0].message.content.strip())
    return out  # pragma: no cover


def mistral_generate(prompts: list) -> list:
    """Reference `generate_mistral_response` (`vector_db.py:768-836`):
    local transformers pipeline, max_new_tokens=100, completion only."""
    pipe = _WORKER_MODELS.get("mistral")
    if pipe is None:
        try:
            from transformers import pipeline  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - lib absent here
            raise NotImplementedError(
                "backend requires transformers (Mistral pipeline); not "
                "installed in this environment"
            ) from e
        pipe = pipeline(  # pragma: no cover
            "text-generation",
            model="mistralai/Mistral-Small-3.1-24B-Instruct-2503",
        )
        _WORKER_MODELS["mistral"] = pipe  # pragma: no cover
    out = []  # pragma: no cover
    for p in prompts:  # pragma: no cover
        messages = [
            {"role": "system", "content": SYSTEM_PROMPT},
            {"role": "user", "content": p},
        ]
        r = pipe(text=messages, max_new_tokens=100, return_full_text=False)
        out.append(r[0]["generated_text"])
    return out  # pragma: no cover


#: name -> executor-side batch generation function.
GEN_BACKENDS: dict[str, Callable[[list], list]] = {
    "stub": stub_generate,
    "openai-gpt-4o": gpt_generate,
    "local-mistral-3": mistral_generate,
}


def resolve_gen_backend(name: str) -> Callable[[list], list]:
    try:
        return GEN_BACKENDS[name]
    except KeyError:
        raise ValueError(
            f"unknown LLM backend {name!r}; known: {sorted(GEN_BACKENDS)}"
        ) from None


def from_conf(spark: SparkSession) -> Callable[[list], list]:
    """Config-selected generation backend (default: the deterministic
    stub — the only backend on the correctness path)."""
    return resolve_gen_backend(spark.conf.get(GEN_CONF_KEY, "stub"))
