"""Geometric label/value pairing over OCR-style token streams.

Reimplements, with identical observable semantics, the reference's
``extract_label_value_pairs`` and ``normalize_ocr_lines``
(/root/reference/src/ocr/postprocess.py:74-208 and :211-264). The
matching here is a *greedy sequential* procedure whose output depends on
input order (stable sort + a used-index set), so it is deliberately kept
as per-document Python — the Spark layer runs it inside Arrow-batched
UDFs rather than re-expressing it relationally, because a relational
as-of join would not be byte-identical (see SURVEY.md §2.3 J2).

Quirks that are load-bearing for parity and intentionally preserved:

* ``min(line.get("confidence", 1.0), ...)`` treats a *missing* key as
  1.0 but propagates an explicit ``None`` (which raises ``TypeError`` in
  ``min``) — documents with explicit-None confidences fail the stage,
  exactly like the reference would; the Spark shell catches this per
  document and routes it to status=failed.
* ``used`` marking of the matched value line goes through
  ``list.index`` (first dict-equal element), not the scan index.
* pairs are emitted before text lines in the normalized output, and
  only ``type == "line"`` tokens with a non-null bounding box become
  text lines.
"""

from __future__ import annotations

from bisect import bisect_right
from collections import defaultdict
from typing import Any, Dict, List, Optional

Token = Dict[str, Any]

# Geometry helpers over 4-point boxes ([{x,y}] * 4). Missing/empty boxes
# behave as the reference's helpers do (centers 0.0, sizes 0.0).


def _cx(box: Optional[List[Dict[str, float]]]) -> float:
    if not box:
        return 0.0
    if len(box) == 4:  # fast path: every real box is a 4-point polygon.
        # Bit-identical to sum(): 0.0+x == x for the non-negative page
        # coordinates here, and left-to-right addition order matches.
        return (box[0]["x"] + box[1]["x"] + box[2]["x"] + box[3]["x"]) / 4
    return sum(p["x"] for p in box) / len(box)


def _cy(box: Optional[List[Dict[str, float]]]) -> float:
    if not box:
        return 0.0
    if len(box) == 4:
        return (box[0]["y"] + box[1]["y"] + box[2]["y"] + box[3]["y"]) / 4
    return sum(p["y"] for p in box) / len(box)


def _height(box: Optional[List[Dict[str, float]]]) -> float:
    if not box:
        return 0.0
    if len(box) == 4:
        y0, y1, y2, y3 = box[0]["y"], box[1]["y"], box[2]["y"], box[3]["y"]
        return max(y0, y1, y2, y3) - min(y0, y1, y2, y3)
    ys = [p["y"] for p in box]
    return max(ys) - min(ys)


def _same_row(box_a, box_b, threshold: float = 0.1) -> bool:
    """Horizontally aligned iff |Δcenter_y| ≤ threshold × max box height."""
    if not box_a or not box_b:
        return False
    tallest = max(_height(box_a), _height(box_b))
    return abs(_cy(box_a) - _cy(box_b)) <= tallest * threshold


def pair_lines(
    ocr_lines: List[Token], y_thresh: float = 0.2, x_split: float = 2.5
) -> List[Dict[str, Any]]:
    """Extract label/value pairs from a token stream.

    Three matching strategies, in order, per page (reference
    postprocess.py:126-206):

    1. same-line ``"label: value"`` colon split;
    2. horizontally aligned pair — for each unconsumed left-of-``x_split``
       line, the nearest unconsumed line to its right on the same row;
    3. lookahead — the first of the next two lines that sits right of
       ``x_split`` within ``y_thresh`` vertically.

    Each consumed line index lands in a per-page used-set so no line is
    claimed twice; the greedy order is part of the contract.
    """
    # The reference stable-sorts the *whole* stream (words included) by
    # page then vertical center and filters to lines after. Filtering
    # FIRST is bit-identical — stability preserves the relative order
    # of equal-key lines either way, and by_page keys (pages with at
    # least one line) come out in the same numeric page order — while
    # skipping the sort-key computation for the ~5× more numerous words.
    # Decorate-sort with the input index as tiebreak (≡ the stable sort
    # on (page, cy)) so the cy computed for the sort key is REUSED as
    # the pass-2 geometry memo instead of being derived a second time.
    decorated = []
    idx = 0
    for t in ocr_lines:
        if t["type"] == "line":
            box = t["bounding_box"]
            if box and len(box) == 4:  # inline _cy's 4-point fast path
                cy = (box[0]["y"] + box[1]["y"] + box[2]["y"] + box[3]["y"]) / 4
            else:
                cy = _cy(box)
            decorated.append((t["page"], cy, idx, t))
            idx += 1
    # plain tuple sort: idx is unique, so comparison always resolves
    # before reaching the token dict — ≡ stable sort on (page, cy)
    decorated.sort()

    by_page: Dict[Any, List[Token]] = defaultdict(list)
    cy_by_page: Dict[Any, List[float]] = defaultdict(list)
    for page, cy, _, tok in decorated:
        by_page[page].append(tok)
        cy_by_page[page].append(cy)

    pairs: List[Dict[str, Any]] = []

    for page, lines in by_page.items():
        used: set = set()

        # Geometry memo: center/height are pure functions of each box —
        # precomputing them turns the O(L²) pass-2 scan's inner test into
        # float compares without changing a single comparison result.
        # One pass computes cx/height/boxed together; cy comes from the
        # sort decoration above.
        cys = cy_by_page[page]
        cxs: List[float] = []
        hts: List[float] = []
        boxed: List[bool] = []
        for ln in lines:
            box = ln["bounding_box"]
            if not box:
                cxs.append(0.0)
                hts.append(0.0)
                boxed.append(False)
            elif len(box) == 4:
                p0, p1, p2, p3 = box
                cxs.append((p0["x"] + p1["x"] + p2["x"] + p3["x"]) / 4)
                y0, y1, y2, y3 = p0["y"], p1["y"], p2["y"], p3["y"]
                hts.append(max(y0, y1, y2, y3) - min(y0, y1, y2, y3))
                boxed.append(True)
            else:
                cxs.append(_cx(box))
                hts.append(_height(box))
                boxed.append(True)
        # Candidate order for pass 2a, sorted by (center-x, line index):
        # scanning ascending x and stopping at the FIRST same-row hit
        # right of the label yields exactly the argmin the original
        # full scan computed — strict `cand_x < best_x` updates mean the
        # smallest cand_x wins, earliest line index among x-ties (the
        # stable (cx, j) key) — with an early break instead of O(L).
        # The sorted cx keys are kept alongside so each label's scan can
        # BISECT past the `cxs[j] <= cx` prefix instead of iterating it
        # (bisect_right lands on the first strictly-greater cx — the
        # identical skip set).
        # Degenerate-height fast path: when EVERY box on the page has
        # zero height (the synthetic layout's single-y line boxes),
        # `tallest * 0.1` is 0 and the same-row test reduces to exact
        # cy equality — so each label only needs to scan its own
        # cy-group (kept in the same (cx, j) candidate order) instead
        # of every line to its right. Any non-zero height falls back
        # to the general scan, which is the only consumer of
        # xorder/xkeys — they are built only on that branch.
        all_flat = not any(hts)
        cy_groups: Dict[float, List[int]] = {}
        if all_flat:
            for j in sorted(range(len(lines)), key=lambda j: (cxs[j], j)):
                cy_groups.setdefault(cys[j], []).append(j)
        else:
            xorder = sorted(range(len(lines)), key=lambda j: (cxs[j], j))
            xkeys = [cxs[j] for j in xorder]
        # stripped text per line, shared by both passes (str.strip is a
        # pure function; pass 1 and pass 2 both need it)
        stripped = [ln["text"].strip() for ln in lines]

        # Pass 1: colon-separated label/value on a single line.
        for i, line in enumerate(lines):
            if i in used:
                continue
            text = stripped[i]
            if ":" not in text:
                continue
            label, _, value = (s.strip() for s in text.partition(":"))
            if label and value:
                pairs.append(
                    {
                        "label": label,
                        "value": value,
                        "page": page,
                        "confidence": line.get("confidence"),
                        "bounding_box": line.get("bounding_box"),
                    }
                )
                used.add(i)

        # Pass 2: geometric pairing for the remaining lines.
        for i, line in enumerate(lines):
            if i in used:
                continue

            text = stripped[i]
            cx, cy = cxs[i], cys[i]
            if cx >= x_split:  # only left-aligned lines act as labels
                continue

            # 2a: nearest unconsumed line to the right on the same row
            # (same-row test identical to _same_row, on memoized values).
            best: Optional[Token] = None
            if boxed[i]:
                cy_i, ht_i = cys[i], hts[i]
                if all_flat:
                    for j in cy_groups[cy_i]:
                        if cxs[j] <= cx or j in used or not boxed[j]:
                            continue
                        best = lines[j]
                        break
                else:
                    for j in xorder[bisect_right(xkeys, cx):]:
                        if j in used or not boxed[j]:
                            continue
                        ht_j = hts[j]
                        tallest = ht_i if ht_i > ht_j else ht_j
                        if abs(cy_i - cys[j]) <= tallest * 0.1:
                            best = lines[j]
                            break

            if best is not None:
                pairs.append(
                    {
                        "label": text,
                        "value": best["text"].strip(),
                        "page": page,
                        "confidence": min(
                            line.get("confidence", 1.0), best.get("confidence", 1.0)
                        ),
                        "bounding_box": best.get("bounding_box"),
                    }
                )
                # First dict-equal element, as in the reference (:184).
                used.update([i, lines.index(best)])
                continue

            # 2b: lookahead over the next two lines.
            for j in range(i + 1, min(i + 3, len(lines))):
                if j in used:
                    continue
                cand = lines[j]
                if cxs[j] > x_split and abs(cys[j] - cy) <= y_thresh:
                    pairs.append(
                        {
                            "label": text,
                            "value": cand["text"].strip(),
                            "page": page,
                            "confidence": min(
                                line.get("confidence", 1.0),
                                cand.get("confidence", 1.0),
                            ),
                            "bounding_box": cand.get("bounding_box"),
                        }
                    )
                    used.update([i, j])
                    break

    return pairs


def _first_token_with_text(text: str, tokens: List[Token]) -> Optional[Token]:
    for tok in tokens:
        if tok["text"] == text:
            return tok
    return None


def normalize_items(ocr_lines: List[Token]) -> List[Dict[str, Any]]:
    """Token stream → structured items: label_value pairs, then text lines.

    Output item shapes and ordering match the reference's
    ``normalize_ocr_lines`` (postprocess.py:211-264): every pair first
    (confidence = pairing confidence, falling back to the min/either of
    the first tokens whose text equals the label/value), then every
    ``line`` token that has a bounding box as a ``text_line``.
    """
    items: List[Dict[str, Any]] = []

    for pair in pair_lines(ocr_lines):
        confidence = pair.get("confidence")
        if confidence is None:
            label_tok = _first_token_with_text(pair["label"], ocr_lines)
            value_tok = _first_token_with_text(pair["value"], ocr_lines)
            if label_tok and value_tok:
                lc = label_tok.get("confidence")
                vc = value_tok.get("confidence")
                if lc is not None and vc is not None:
                    confidence = min(lc, vc)
                elif lc is not None:
                    confidence = lc
                elif vc is not None:
                    confidence = vc

        items.append(
            {
                "type": "label_value",
                "label": pair["label"],
                "value": pair["value"],
                "page": pair["page"],
                "confidence": confidence,
                "bounding_box": pair.get("bounding_box"),
            }
        )

    for tok in ocr_lines:
        if tok["type"] != "line" or tok.get("bounding_box") is None:
            continue
        items.append(
            {
                "type": "text_line",
                "text": tok["text"].strip(),
                "page": tok["page"],
                "confidence": tok.get("confidence"),
                "bounding_box": tok.get("bounding_box"),
            }
        )

    return items
