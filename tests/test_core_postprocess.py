"""Parity tests for the pairing/normalization core.

Assertions ported from the reference suite (unchanged semantics):
* tests/test_postprocess_label_extraction.py:8-34 (3-line inline case)
* tests/test_field_extraction.py:153-201 (46-line form fixture)
* tests/test_mock_ocr_results.py:104-109 (bbox shape invariants)
"""

from __future__ import annotations

from credit_ocr_backend_spark.core import normalize_items, pair_lines


def test_normalize_three_line_sample() -> None:
    # Reference tests/test_postprocess_label_extraction.py:8-34, verbatim input.
    sample = [
        {"type": "line", "text": "Firmenname", "page": 1, "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "Demo Tech GmbH", "page": 1, "bounding_box": [{"x": 3.0, "y": 1.01}] * 4},
        {"type": "line", "text": "USt-ID: DE123456789", "page": 1, "bounding_box": [{"x": 0.5, "y": 2.0}] * 4},
    ]
    normalized = normalize_items(sample)

    label_value = [e for e in normalized if e["type"] == "label_value"]
    text_lines = [e for e in normalized if e["type"] == "text_line"]

    expected_pairs = [
        {"type": "label_value", "label": "Firmenname", "value": "Demo Tech GmbH", "page": 1},
        {"type": "label_value", "label": "USt-ID", "value": "DE123456789", "page": 1},
    ]
    for expected in expected_pairs:
        assert any(
            all(actual[k] == expected[k] for k in expected) for actual in label_value
        ), f"Expected pair not found: {expected}"

    assert any("Demo Tech GmbH" in line["text"] for line in text_lines)


def test_pairs_on_full_form(sample_ocr_lines, expected_pairs) -> None:
    pairs = pair_lines(sample_ocr_lines)
    got = [(p["label"], p["value"]) for p in pairs]
    assert got == expected_pairs  # every row pairs, in reading order

    # Pair confidence is min(label, value) — reference postprocess.py:180-181.
    by_label = {p["label"]: p for p in pairs}
    assert by_label["Firmenname"]["confidence"] == 0.95
    assert by_label["Rechtsform"]["confidence"] == 0.95
    # Pair carries the *value* line's bounding box.
    assert by_label["Firmenname"]["bounding_box"][0] == {"x": 3.0, "y": 1.01}


def test_normalized_output_order_and_shape(sample_ocr_lines) -> None:
    items = normalize_items(sample_ocr_lines)
    kinds = [i["type"] for i in items]
    n_pairs = kinds.count("label_value")
    # Pairs first, then every line token as a text_line (reference order).
    assert kinds == ["label_value"] * n_pairs + ["text_line"] * (len(kinds) - n_pairs)
    assert kinds.count("text_line") == len(sample_ocr_lines)
    for item in items:
        assert len(item["bounding_box"]) == 4
        for point in item["bounding_box"]:
            assert set(point) == {"x", "y"}


def test_colon_pass_consumes_line_before_geometry() -> None:
    # A colon line is claimed by pass 1 and never re-used by pass 2.
    lines = [
        {"type": "line", "text": "USt-ID: DE123456789", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
        {"type": "line", "text": "DE999999999", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": 0.9},
    ]
    pairs = pair_lines(lines)
    assert ("USt-ID", "DE123456789") in [(p["label"], p["value"]) for p in pairs]
    # The stray right-hand line can't pair with the consumed colon line.
    assert len(pairs) == 1


def test_words_never_pair() -> None:
    lines = [
        {"type": "word", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
        {"type": "word", "text": "DemoTech", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": 0.9},
    ]
    assert pair_lines(lines) == []
    assert normalize_items(lines) == []


def test_missing_confidence_defaults_to_one_in_min() -> None:
    # get("confidence", 1.0) semantics: missing key → 1.0 (reference :180).
    lines = [
        {"type": "line", "text": "Laufzeit", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "20 Jahre", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": 0.7},
    ]
    pairs = pair_lines(lines)
    assert pairs[0]["confidence"] == 0.7


def test_normalize_backfills_pair_confidence_from_tokens() -> None:
    # Only colon-pass pairs can carry a None confidence (geometric pairs
    # min() with a 1.0 default). When None, normalize looks the label and
    # value texts up in the raw stream and takes min/either
    # (reference postprocess.py:229-239).
    lines = [
        {"type": "line", "text": "Firmenname: DemoTech GmbH", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},  # no confidence key
        {"type": "word", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.88},
        {"type": "word", "text": "DemoTech GmbH", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.0}] * 4, "confidence": 0.92},
    ]
    items = normalize_items(lines)
    pair = [i for i in items if i["type"] == "label_value"][0]
    assert (pair["label"], pair["value"]) == ("Firmenname", "DemoTech GmbH")
    assert pair["confidence"] == 0.88  # min(label 0.88, value 0.92)

    # Geometric pairs with a *missing* confidence key resolve to 1.0, not None.
    geo = [
        {"type": "line", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4},
        {"type": "line", "text": "DemoTech GmbH", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4},
    ]
    geo_pair = [i for i in normalize_items(geo) if i["type"] == "label_value"][0]
    assert geo_pair["confidence"] == 1.0


def test_multi_page_grouping() -> None:
    lines = [
        {"type": "line", "text": "Baujahr", "page": 2,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
        {"type": "line", "text": "1995", "page": 2,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": 0.9},
        {"type": "line", "text": "Firmenname", "page": 1,
         "bounding_box": [{"x": 0.5, "y": 1.0}] * 4, "confidence": 0.9},
        {"type": "line", "text": "DemoTech GmbH", "page": 1,
         "bounding_box": [{"x": 3.0, "y": 1.01}] * 4, "confidence": 0.9},
    ]
    pairs = pair_lines(lines)
    assert [(p["label"], p["page"]) for p in pairs] == [
        ("Firmenname", 1),
        ("Baujahr", 2),
    ]
