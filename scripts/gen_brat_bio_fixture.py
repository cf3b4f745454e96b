#!/usr/bin/env python3
"""Real-corpus BIO parity fixture: loads docs from the five reference BRAT
corpora with the REFERENCE's own loader semantics, runs the REFERENCE's
Instance.get_bio_annotations on the gold entities, and dumps
(dataset, doc_id, text, entities, bio) as JSON. BratSpec replays every case
through graft.text.Tokenize.bioTags and compares exactly.

Deterministic: first N annotated docs of each corpus in sorted filename
order. Regenerate only if the selection changes."""
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/reference")

from dataset import Instance  # noqa: E402
from model.entity import Entity  # noqa: E402

N_PER_CORPUS = 6
ROOT = Path("/root/reference/datasets")

CORPORA = [
    # (name, dir, exact3-variant?, skip-hash?)
    ("multicardioner_track1", "multicardioner-track1/cardioccc_test/brat", False, False),
    ("multicardioner_track2_en", "multicardioner-track2/en/brat", True, True),
    ("multicardioner_track2_es", "multicardioner-track2/es/brat", True, True),
    ("multicardioner_track2_it", "multicardioner-track2/it/brat", True, True),
    ("pharmaconer", "PharmaCoNERCorpus/test", True, True),
]


def load(ann_file: Path, txt_file: Path, exact3: bool, skip_hash: bool):
    """Faithful port of reference datasets_info/utils/brat.py:6-43 and the
    multicardioner_track1.py:10-41 variant."""
    text = open(txt_file, encoding="utf-8").read().strip()
    entities = []
    if ann_file.exists():
        for line in open(ann_file, encoding="utf-8"):
            if line.startswith("T"):
                if skip_hash and "#" in line:
                    continue
                parts = line.strip().split("\t")
                ok = (len(parts) == 3) if exact3 else (len(parts) >= 3)
                if ok:
                    _, span_type, text_span = parts[0], parts[1], parts[2]
                    category, start, end = span_type.split()
                    entities.append(Entity(entity=text_span, category=category,
                                           span=(int(start), int(end))))
    return text, (entities if entities else None)


cases = []
for name, rel, exact3, skip_hash in CORPORA:
    d = ROOT / rel
    picked = 0
    for ann in sorted(d.glob("*.ann")):
        if picked >= N_PER_CORPUS:
            break
        txt = ann.with_suffix(".txt")
        if not txt.exists():
            continue
        text, entities = load(ann, txt, exact3, skip_hash)
        if not entities:
            continue
        inst = Instance(text=text, entities=entities)
        bio = inst.get_bio_annotations()
        cases.append({
            "dataset": name,
            "doc_id": ann.stem,
            "text": text,
            "entities": [{"category": e.category, "surface": e.entity,
                          "begin": e.span[0], "end": e.span[1]} for e in entities],
            "bio": bio,
        })
        picked += 1

out = Path(__file__).resolve().parent.parent / "src/test/resources/brat_bio_cases.json"
out.write_text(json.dumps(cases, ensure_ascii=False))
print(f"wrote {len(cases)} cases to {out}")
