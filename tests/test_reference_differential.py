"""Randomized differential parity vs the REFERENCE implementation.

The golden tests pin 4 full documents; these tests go after the edge
space: hypothesis-generated OCR-style token streams are run through the
engine's ``normalize_items`` / ``extract_fields`` AND the reference's
own ``normalize_ocr_lines`` / ``extract_fields_with_llm`` (imported
from /root/reference via the same sys.modules shims the golden
generator installs, deterministic alias mapper injected as the LLM),
and the outputs must be deep-equal — including which inputs RAISE
(the engine deliberately preserves the reference's min(None, float)
TypeError on explicit-None confidences).
"""

from __future__ import annotations

import asyncio
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
import gen_reference_goldens  # noqa: F401  (installs reference import shims)
from src.llm import field_extractor as ref_fx  # noqa: E402
from src.ocr import postprocess as ref_post  # noqa: E402

from credit_ocr_backend_spark.core import default_config  # noqa: E402
from credit_ocr_backend_spark.core.fields import (  # noqa: E402
    extract_fields,
    map_items_to_fields,
)
from credit_ocr_backend_spark.core.postprocess import normalize_items  # noqa: E402

from hypothesis import given, settings, strategies as st  # noqa: E402

CFG = default_config()
REF_CFG = ref_fx.DocumentTypeConfig(
    name=CFG.name,
    expected_fields=list(CFG.expected_fields),
    field_descriptions=dict(CFG.field_descriptions),
    validation_rules=dict(CFG.validation_rules),
    field_mappings=dict(CFG.field_mappings),
)

_LABELS = list(CFG.field_mappings)[:8]
_TEXTS = _LABELS + [
    "Firmenname: Demo Tech GmbH",
    "USt-ID: DE123456789",
    "Demo Tech GmbH",
    "50.000 €",
    "[x] Ja",
    "12.03.2024",
    "plain prose line",
    "a:b:c",
    " :x",
    "x: ",
    "",
    "  spaced  ",
]

_box = st.one_of(
    st.none(),
    st.builds(
        lambda x, y: [{"x": x, "y": y}] * 4,
        st.sampled_from([0.3, 0.5, 2.6, 3.0, 5.5]),
        st.floats(min_value=0.0, max_value=4.0, allow_nan=False).map(
            lambda v: round(v, 2)
        ),
    ),
)

_token = st.builds(
    lambda type_, text, page, box, conf: {
        "type": type_,
        "text": text,
        "page": page,
        "bounding_box": box,
        "confidence": conf,
    },
    st.sampled_from(["line", "word"]),
    st.sampled_from(_TEXTS),
    st.integers(min_value=1, max_value=2),
    _box,
    st.one_of(st.none(), st.sampled_from([0.55, 0.72, 0.9, 0.97, 1.0])),
)

_stream = st.lists(_token, max_size=12)


class _MapperLLM:
    def __init__(self, items):
        self._items = items

    async def generate(self, prompt: str) -> str:
        return json.dumps(map_items_to_fields(self._items, CFG), ensure_ascii=False)


def _run(fn):
    try:
        return ("ok", fn())
    except Exception as exc:
        return ("raise", type(exc).__name__)


@settings(max_examples=250, deadline=None)
@given(_stream)
def test_normalize_matches_reference(tokens):
    eng = _run(lambda: normalize_items(tokens))
    ref = _run(lambda: ref_post.normalize_ocr_lines(tokens))
    assert eng == ref


@settings(max_examples=250, deadline=None)
@given(_stream)
def test_extract_matches_reference(tokens):
    try:
        items = normalize_items(tokens)
    except Exception:
        return  # covered by the normalize differential above

    eng = _run(lambda: extract_fields(items, CFG, original_ocr_lines=tokens))
    ref = _run(
        lambda: asyncio.run(
            ref_fx.extract_fields_with_llm(
                items, REF_CFG, _MapperLLM(items), original_ocr_lines=tokens
            )
        )
    )
    assert eng == ref


def test_reference_quirk_none_confidence_raises_in_both():
    """The reference's pass-2 pairing does min(None, …) when a line has
    an explicit None confidence next to a defaulted one — TypeError in
    both implementations (pytest parity, not a bug to fix)."""
    tokens = [
        {"type": "line", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": None},
        {"type": "line", "text": "DemoTech", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": None},
    ]
    eng = _run(lambda: normalize_items(tokens))
    ref = _run(lambda: ref_post.normalize_ocr_lines(tokens))
    assert eng == ref


# ---- scalar differentials: clean_value / validate_field ------------------

from credit_ocr_backend_spark.core.fields import (  # noqa: E402
    clean_value,
    validate_field,
)

_VALUES = st.one_of(
    st.sampled_from([
        "", " ", "50.000 €", "1.234,56", "€€", "m² 85", "85 m²", "12.03.2024",
        "2024-03-12", "1.2.2024", "[x] Ja", "[ ] Nein", "[X]", "abc", "1a2b3c",
        "0", "-5", "00.00.0000", ".", ",", "1.000.000", "DE123456789",
    ]),
    st.text(
        alphabet="0123456789.,€ m²[]xXa-", max_size=12
    ),
)
_FIELD_TYPES = st.sampled_from(
    ["string", "date", "currency", "area", "number", "boolean", "unknown"]
)


@settings(max_examples=500, deadline=None)
@given(_VALUES, _FIELD_TYPES)
def test_clean_value_matches_reference(value, field_type):
    eng = _run(lambda: clean_value(value, field_type))
    ref = _run(lambda: ref_fx.clean_value(value, field_type))
    assert eng == ref


_RULES = st.builds(
    lambda t, lo, hi, pat: {
        k: v
        for k, v in [("type", t), ("min", lo), ("max", hi), ("pattern", pat)]
        if v is not None
    },
    st.one_of(st.none(), st.sampled_from(["number", "boolean", "date", "string"])),
    st.one_of(st.none(), st.sampled_from([0, 1, 1000])),
    st.one_of(st.none(), st.sampled_from([100, 10_000_000])),
    st.one_of(st.none(), st.sampled_from([r"^\d{2}\.\d{2}\.\d{4}$", r"^DE\d{9}$", r"\d+"])),
)
_FIELD_DATA = st.one_of(
    st.none(),
    st.sampled_from(["bare-string", 42, 3.14, True]),
    st.builds(
        lambda v: {"value": v},
        st.sampled_from(
            [None, "50.000", "1.234,56", "true", "False", "xyz", 7, 0.5, "12.03.2024"]
        ),
    ),
    st.just({"no_value_key": 1}),
)


@settings(max_examples=500, deadline=None)
@given(_FIELD_DATA, _RULES)
def test_validate_field_matches_reference(field_data, rules):
    eng = _run(lambda: validate_field(field_data, rules))
    ref = _run(lambda: ref_fx.validate_field(field_data, rules))
    assert eng == ref
