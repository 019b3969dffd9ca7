"""Deterministic synthetic transcripts generator (FIXTURES.md §1-§3).

Seeded, wall-clock-free.  Produces rows shaped exactly like
BASELINE.json input_hint: (conv_id string, turn_idx int32, role string,
text string, tool string, ts timestamp).  Payloads exercise every rule
trigger: visit boundaries, all three date formats incl. century pivots,
section headers, confidence triggers ([UNCLEAR..], handwriting markers,
ambiguous-char ratios, ALL-CAPS abbreviations, blocked strings), known
variants, symbols and pipe tables — wrapped in boilerplate the
extractor must strip (nav/header lines, page banners, footers,
disclaimers).
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

BASE_TS = datetime(2024, 1, 1, 0, 0, 0)

ROLES = ["user", "assistant", "tool"]
TOOLS = [None, "ocr", "upload", None, None]

_BOUNDARY_LINES = [
    "Visit Date: {d1}",
    "Date of Service: {d1}",
    "Encounter Date: {d2}",
    "Admission Date: {d1}",
    "Discharge Date: {d3}",
    "{d1} Follow-up note",
]

_SECTION_BLOCKS = [
    "CHIEF COMPLAINT:\nPatient reports fatigue and increased thirst.",
    "HPI:\n58 yo with polydypsia and blurred vision x 2 weeks.",
    "PAST MEDICAL HISTORY:\n- Type 2 Diabetes Mellitus\n- Hypertension\n- HTN",
    "MEDICATIONS:\nMetformin 500mg BID PO\nLisinopril 10mg daily\naspirin 81mg",
    "ALLERGIES:\nPenicillin - rash\nNKDA per patient (?)",
    "PHYSICAL EXAM:\nBP 142/88  HR 76  T 98.6F\nLungs clear, BS normal",
    "ASSESSMENT:\nType 2 Diabetes, uncontrolled. haemoglobin A1c pending.",
    "PLAN:\n1. Increase Metformin to 1000mg\n2. CBC CMP A1C labs\n3. RTC 3 months",
    "IMPRESSION:\nStable. Continue current regimen.",
    "LABORATORY:\nGlucose | 110 | mg/dL | H\nA1c | 8.2 | % | H",
    "VITAL SIGNS:\nBP 130/80 ± 5\nTemp 37.0 °C ↑",
    "REVIEW OF SYSTEMS:\nNegative except as noted. RA in hands possibly.",
]

_NOISE_SNIPPETS = [
    "Patient seen today. [UNCLEAR: medication name] prescribed.",
    "Signature illegible, hard to read ~~~",
    "l1lI O0O lIl 1O0 Il1O",  # ambiguous-char heavy
    "ok",  # sub-50-char stub
    "Response blocked by safety filter",
    "HTN DM2 BID PRN PO CBC QID TID",  # >5 ALL-CAPS abbrevs
    "Checkboxes: ✓ done ☐ pending ☑ reviewed",
    "MS noted in chart. PC follow-up. AS murmur.",
    "[UNCLEAR: dose] [UNCLEAR: frequency] [UNCLEAR: route]",
    "oesophagus exam normal; hypoglycemia episodes denied",
]

_HEADER_BOILERPLATE = [
    "Home | About Us | Contact | Help",
    "Printed on 2024-01-15 by MedPortal EHR v3.2",
    "https://portal.example-hospital.test/records",
]

_FOOTER_BOILERPLATE = [
    "Page {p} of {n}",
    "(c) 2024 Example Hospital System",
    "CONFIDENTIALITY NOTICE: intended recipient only",
    "This document may contain privileged information.",
    "Do not distribute without authorization.",
    "Electronically signed by J. Smith MD",
]

_DATES = [
    "03/15/2024", "2024-03-15", "12/01/23", "01/02/49", "01/02/51",
    "7/4/2023", "2023-7-4", "11-30-2022", "99/99/2024 then 04/01/2024",
]


def _payload(rng: random.Random, turn_idx: int, with_boundary: bool) -> str:
    parts: list[str] = []
    if with_boundary:
        d = rng.choice(_DATES), rng.choice(_DATES), rng.choice(_DATES)
        parts.append(rng.choice(_BOUNDARY_LINES).format(d1=d[0], d2=d[1], d3=d[2]))
    for _ in range(rng.randint(1, 3)):
        parts.append(rng.choice(_SECTION_BLOCKS))
    if rng.random() < 0.55:
        parts.append(rng.choice(_NOISE_SNIPPETS))
    if rng.random() < 0.1:
        parts = [rng.choice(_NOISE_SNIPPETS)]  # short/noisy-only turn
    return "\n".join(parts)


def _wrap_boilerplate(rng: random.Random, payload: str, page: int, total: int) -> str:
    out: list[str] = []
    out.append(f"--- Page {page} ---")
    for h in rng.sample(_HEADER_BOILERPLATE, rng.randint(0, 2)):
        out.append(h)
    if rng.random() < 0.3:
        out.append("=====")
    out.append(payload)
    if rng.random() < 0.3:
        out.append("")
        out.append("")  # blank-line run for the collapse rule
    for f in rng.sample(_FOOTER_BOILERPLATE, rng.randint(1, 3)):
        out.append(f.format(p=page, n=total))
    return "\n".join(out)


def generate_transcripts(n_conversations: int = 100, seed: int = 42,
                         shuffle: bool = True) -> list[dict]:
    """Deterministic transcript rows; turn order shuffled on disk so the
    stable-ordering invariant is actually exercised."""
    rng = random.Random(seed)
    rows: list[dict] = []
    for c in range(n_conversations):
        conv_id = f"conv_{c:06d}"
        # Zipf-ish skew: a few long conversations, most short
        r = rng.random()
        if r < 0.02:
            n_turns = rng.randint(50, 200)
        elif r < 0.15:
            n_turns = rng.randint(10, 50)
        else:
            n_turns = rng.randint(1, 10)
        for t in range(1, n_turns + 1):
            with_boundary = t == 1 or rng.random() < 0.18
            payload = _payload(rng, t, with_boundary)
            text = _wrap_boilerplate(rng, payload, t, n_turns)
            rows.append({
                "conv_id": conv_id,
                "turn_idx": t,
                "role": ROLES[(t - 1) % 3],
                "text": text,
                "tool": rng.choice(TOOLS),
                "ts": BASE_TS + timedelta(minutes=t, seconds=c % 60),
            })
    if shuffle:
        rng.shuffle(rows)
    return rows


def transcripts_spark_df(spark, n_conversations: int = 100, seed: int = 42):
    """Create the transcripts DataFrame with the declared schema."""
    from pyspark.sql import types as T

    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ])
    rows = generate_transcripts(n_conversations, seed)
    return spark.createDataFrame(
        [(r["conv_id"], r["turn_idx"], r["role"], r["text"], r["tool"], r["ts"])
         for r in rows],
        schema=schema,
    )


# --- golden entity fixtures (FIXTURES.md §3) -------------------------------

def entity_fixtures() -> dict[str, list[dict]]:
    """Hand-pinned dedup/merge cases from the reference's integration tests."""
    meds = [
        {"conv_id": "conv_e", "visit_id": "visit_001", "name": "Aspirin",
         "dose": "81mg", "frequency": "daily", "route": None, "source_page": 1},
        {"conv_id": "conv_e", "visit_id": "visit_001", "name": "aspirin",
         "dose": "81mg", "frequency": None, "route": "PO", "source_page": 3},
        {"conv_id": "conv_e", "visit_id": "visit_001", "name": "Metformin",
         "dose": "500mg", "frequency": None, "route": None, "source_page": 1},
        {"conv_id": "conv_e", "visit_id": "visit_001", "name": "Metformin",
         "dose": "1000mg", "frequency": "BID", "route": "PO", "source_page": 2},
        {"conv_id": "conv_e", "visit_id": "visit_002", "name": "Lisinopril",
         "dose": "10mg", "frequency": "daily", "route": None, "source_page": 4},
    ]
    problems = [
        {"conv_id": "conv_e", "visit_id": "visit_001",
         "problem": "Type 2 Diabetes Mellitus", "icd10_code": "E11.9",
         "status": "active", "source_page": 1},
        # one-char typo -> SequenceMatcher ratio ~0.98 >= 0.85 (true fuzzy
        # merge; note "Type 2 Diabetes" alone scores only 0.769 vs the
        # full string — the reference's own integration test claims it
        # merges, but its code keeps them separate; we follow the code)
        {"conv_id": "conv_e", "visit_id": "visit_001",
         "problem": "Type 2 Diabetes Melitus", "icd10_code": None,
         "status": None, "source_page": 2},
        {"conv_id": "conv_e", "visit_id": "visit_001",
         "problem": "Hypertension", "icd10_code": "I10",
         "status": "active", "source_page": 1},
        {"conv_id": "conv_e", "visit_id": "visit_001",
         "problem": "HTN", "icd10_code": None,
         "status": None, "source_page": 3},
    ]
    results = [
        {"conv_id": "conv_e", "visit_id": "visit_001", "test_name": "Glucose",
         "value": "110", "unit": "mg/dL", "reference_range": "70-100",
         "abnormal_flag": "H", "source_page": 1},
        {"conv_id": "conv_e", "visit_id": "visit_001", "test_name": "glucose",
         "value": "120", "unit": "mg/dL", "reference_range": None,
         "abnormal_flag": None, "source_page": 2},
        {"conv_id": "conv_e", "visit_id": "visit_001", "test_name": "A1c",
         "value": "8.2", "unit": "%", "reference_range": "<5.7",
         "abnormal_flag": "H", "source_page": 1},
        {"conv_id": "conv_e", "visit_id": "visit_001", "test_name": "A1C",
         "value": "8.2", "unit": None, "reference_range": None,
         "abnormal_flag": None, "source_page": 3},
    ]
    return {"medications": meds, "problems": problems, "results": results}
