"""Property-based tests (hypothesis) for the deterministic core.

The pairing procedure is greedy and order-sensitive by contract, so we
don't test for relational-style invariance — we test the invariants the
reference semantics do guarantee on arbitrary token streams:

* no line is consumed twice (used-set discipline);
* every pair's label/value text originates from the stream;
* confidences stay in [0, 1] when inputs do;
* normalize output = pairs first, then exactly the boxed lines;
* parse_page never raises on arbitrary bytes;
* determinism: same input → byte-identical output.
"""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st

from credit_ocr_backend_spark.core import (
    default_config,
    extract_fields,
    normalize_items,
    pair_lines,
    parse_page,
)

_CONF = st.one_of(st.none(), st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
_COORD = st.floats(min_value=0.0, max_value=10.0, allow_nan=False, width=32)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
    min_size=0,
    max_size=40,
)


@st.composite
def _token(draw, line_conf_none: bool = False):
    x = draw(_COORD)
    y = draw(_COORD)
    w = draw(st.floats(min_value=0.0, max_value=3.0, allow_nan=False, width=32))
    box = draw(
        st.one_of(
            st.none(),
            st.just(
                [
                    {"x": x, "y": y},
                    {"x": x + w, "y": y},
                    {"x": x + w, "y": y},
                    {"x": x, "y": y},
                ]
            ),
        )
    )
    kind = draw(st.sampled_from(["line", "word"]))
    # Explicit-None confidence on a *line* reaching the geometric pass
    # raises in the reference (min(None, …) — preserved quirk, see
    # core/postprocess.py docstring), so the invariant tests generate
    # real confidences for lines; the quirk has its own test below.
    conf = draw(
        _CONF
        if (kind == "word" or line_conf_none)
        else st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
    )
    return {
        "type": kind,
        "text": draw(_TEXT),
        "page": draw(st.integers(min_value=1, max_value=3)),
        "bounding_box": box,
        "confidence": conf,
    }


_STREAM = st.lists(_token(), max_size=25)


@given(_STREAM)
@settings(max_examples=150, deadline=None)
def test_pairing_invariants(tokens):
    pairs = pair_lines(tokens)
    line_texts = [t["text"].strip() for t in tokens if t["type"] == "line"]
    joined = [t["text"] for t in tokens if t["type"] == "line"]
    for p in pairs:
        # label/value come from the stream: either a colon split of one
        # line or the stripped texts of two lines
        from_colon = any(
            ":" in t and p["label"] == t.split(":", 1)[0].strip()
            and p["value"] == t.split(":", 1)[1].strip()
            for t in (s.strip() for s in joined)
        )
        from_geometry = p["label"] in line_texts and p["value"] in line_texts
        assert from_colon or from_geometry
        if p["confidence"] is not None:
            assert 0.0 <= p["confidence"] <= 1.0
    # a value line is consumed at most once per page
    for page in {p["page"] for p in pairs}:
        consumed = [
            (p["label"], p["value"]) for p in pairs if p["page"] == page
        ]
        assert len(consumed) == len(set(consumed)) or len(consumed) <= len(line_texts)


@given(_STREAM)
@settings(max_examples=100, deadline=None)
def test_normalize_shape_and_determinism(tokens):
    items1 = normalize_items(tokens)
    items2 = normalize_items(json.loads(json.dumps(tokens)))
    assert json.dumps(items1, sort_keys=True) == json.dumps(items2, sort_keys=True)

    kinds = [i["type"] for i in items1]
    n_pairs = kinds.count("label_value")
    assert kinds == ["label_value"] * n_pairs + ["text_line"] * (len(kinds) - n_pairs)
    n_boxed_lines = sum(
        1 for t in tokens if t["type"] == "line" and t.get("bounding_box") is not None
    )
    assert kinds.count("text_line") == n_boxed_lines


@given(_STREAM)
@settings(max_examples=60, deadline=None)
def test_extract_fields_never_raises_and_bounds(tokens):
    cfg = default_config()
    items = normalize_items(tokens)
    result = extract_fields(items, cfg, original_ocr_lines=tokens)
    assert set(result) == {"extracted_fields", "missing_fields", "validation_results"}
    for data in result["extracted_fields"].values():
        conf = data.get("confidence")
        if conf is not None:
            assert 0.0 <= conf <= 1.0
    assert set(result["missing_fields"]) <= set(cfg.expected_fields)


def test_none_confidence_quirk_is_preserved():
    # Two pairable lines with explicit-None confidence: the reference's
    # min(line.get("confidence", 1.0), ...) propagates the None into
    # min() and raises — parity means raising too; the Spark shell
    # isolates it per document (status=failed).
    import pytest

    lines = [
        {"type": "line", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": None},
        {"type": "line", "text": "DemoTech", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": None},
    ]
    with pytest.raises(TypeError):
        pair_lines(lines)


@given(st.binary(max_size=4000))
@settings(max_examples=100, deadline=None)
def test_parse_page_total_on_bytes(raw):
    tokens, text = parse_page(raw)
    assert isinstance(text, str)
    for t in tokens:
        assert t["type"] in ("line", "word")


@given(_TEXT)
@settings(max_examples=100, deadline=None)
def test_parse_page_total_on_htmlish(text):
    html = f"<html><body><p>{text}</p><div><span>{text}</span></div></body>"
    tokens, extracted = parse_page(html)
    t1 = json.dumps(tokens, sort_keys=True)
    tokens2, extracted2 = parse_page(html)
    assert extracted == extracted2
    assert t1 == json.dumps(tokens2, sort_keys=True)
