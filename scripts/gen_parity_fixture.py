#!/usr/bin/env python3
"""Differential-parity fixture generator: runs the REAL reference code
(/root/reference) on seeded random inputs and records its outputs as JSON.
The ScalaTest ParityFuzzSpec replays every case through the engine and
compares exactly. Deterministic (seed=42); regenerate only if cases change.

The reference imports langchain/ollama at module import time; those are not
installed here, so lightweight stubs are injected (the code paths under test
never call them — the LLM itself is mocked per case)."""
import json, random, sys, types

sys.path.insert(0, "/root/reference")

# ---- stub external deps of the reference (never exercised by these paths) --
lc = types.ModuleType("langchain")
lcp = types.ModuleType("langchain.prompts")
class PromptTemplate:
    def __init__(self, template, input_variables):
        self.template = template
    def format(self, **kw):
        out = self.template
        for k, v in kw.items():
            out = out.replace("{%s}" % k, v)
        return out
lcp.PromptTemplate = PromptTemplate
lc.prompts = lcp
sys.modules["langchain"] = lc
sys.modules["langchain.prompts"] = lcp

lcs = types.ModuleType("langchain.schema")
for name in ["BaseMessage", "HumanMessage", "SystemMessage"]:
    setattr(lcs, name, type(name, (), {}))
sys.modules["langchain.schema"] = lcs
lct = types.ModuleType("langchain_together")
lct.ChatTogether = type("ChatTogether", (), {})
sys.modules["langchain_together"] = lct
ol = types.ModuleType("ollama")
ol.Client = type("Client", (), {"__init__": lambda self, **kw: None})
olc = types.ModuleType("ollama._client")
olc.Message = dict
sys.modules["ollama"] = ol
sys.modules["ollama._client"] = olc

from ai.extractor_ner import ExtractorNER  # noqa: E402
from model.category import Category  # noqa: E402
from dataset import Instance  # noqa: E402
from model.entity import Entity  # noqa: E402

rng = random.Random(42)

WORDS = ["spark", "merge", "sort", "table", "scan", "hash", "join", "the",
         "data", "Apple", "Google", "New", "York", "entità", "über", "a"]
CATS = ["TOOL", "OPERATION", "PLACE", "ORG"]


class MockLLM:
    def __init__(self, completion):
        self.completion = completion
    def generate_completion(self, system_prompt, user_prompt, stream_output=False):
        return self.completion


def rand_text():
    n = rng.randint(0, 40)
    parts = []
    for _ in range(n):
        parts.append(rng.choice(WORDS))
        r = rng.random()
        if r < 0.15:
            parts.append("\n")
        elif r < 0.25:
            parts.append("  ")
        else:
            parts.append(" ")
    return "".join(parts)


def rand_completion(text):
    lines = []
    for _ in range(rng.randint(0, 6)):
        r = rng.random()
        if r < 0.15:
            lines.append(rng.choice(["None", "no entities", "malformed line", "", ":"]))
        else:
            cat = rng.choice(CATS + ["BOGUS"])
            surf_words = [rng.choice(WORDS) for _ in range(rng.randint(1, 2))]
            surf = " ".join(surf_words)
            deco = rng.random()
            if deco < 0.6:
                lines.append(f"<{cat}>:{surf}")
            elif deco < 0.8:
                lines.append(f"{cat}: {surf} ")
            else:
                lines.append(f"<{cat}>: {surf}")
    body = "\n".join(lines)
    if rng.random() < 0.2:
        body = f"<think>\nreasoning {rng.randint(0,9)}\n</think>\n" + body
    return body


def main():
    cases = []
    # extractor differential cases
    for i in range(250):
        text = rand_text()
        spc = rng.choice([0, 0, 1, 2, 3])
        completion = rand_completion(text)
        cats = [Category(c, f"{c} desc") for c in CATS]
        ext = ExtractorNER(MockLLM(completion), language="en", example_prompt=None)
        ents = ext.extract_entities(cats, text, spc)
        cases.append({
            "kind": "extract",
            "text": text, "spc": spc, "completion": completion,
            "strip_thinking": False,
            "entities": sorted([[e.category, e.entity, e.span[0], e.span[1]]
                                for e in ents], key=lambda x: (x[2], x[0], x[1])),
        })
    # token-alignment / BIO differential cases
    for i in range(250):
        text = rand_text()
        ents = []
        for _ in range(rng.randint(0, 3)):
            if len(text) == 0:
                b = rng.randint(0, 3); e = b + rng.randint(0, 4)
            else:
                b = rng.randint(0, max(0, len(text) - 1) + 2)
                e = b + rng.randint(0, 8)
            ents.append(Entity(rng.choice(CATS), text[b:e] if b < len(text) else "", (b, e)))
        inst = Instance(text=text, entities=ents)
        spans = [inst._get_token_indexes_from_span(en.span) for en in ents]
        cases.append({
            "kind": "bio",
            "text": text,
            "entities": [[en.category, en.entity, en.span[0], en.span[1]] for en in ents],
            "token_spans": [[s[0], s[1]] if s[0] is not None else None for s in spans],
            "bio": inst.get_bio_annotations(),
        })
    out = sys.argv[1] if len(sys.argv) > 1 else "src/test/resources/parity_cases.json"
    with open(out, "w", encoding="utf-8") as f:
        json.dump(cases, f, ensure_ascii=False)
    print(f"wrote {len(cases)} cases to {out}")


if __name__ == "__main__":
    main()
