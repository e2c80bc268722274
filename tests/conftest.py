"""Shared fixtures: the reference's canonical synthetic inputs.

The 46-line credit-request form fixture reproduces
/root/reference/tests/test_field_extraction.py:153-201 verbatim (labels
at x=0.5, values at x=3.0, row k at y=k.0/k.01, page 1) — it is the
semantic contract both the core parity tests and the Spark equivalence
tests assert against.
"""

from __future__ import annotations

import pytest

from credit_ocr_backend_spark.core import default_config


def _line(text: str, x: float, y: float, conf: float) -> dict:
    return {
        "type": "line",
        "text": text,
        "page": 1,
        "bounding_box": [{"x": x, "y": y}] * 4,
        "confidence": conf,
    }


_FORM = [
    ("Firmenname", 0.95, "DemoTech GmbH", 0.98),
    ("Rechtsform", 0.95, "Gesellschaft mit beschränkter Haftung (GmbH)", 0.97),
    ("Gründungsdatum", 0.95, "15.03.2018", 0.99),
    ("Geschäftsanschrift", 0.95, "Hauptstraße 123, 70173 Stuttgart", 0.96),
    ("Handelsregisternummer / Gericht", 0.95, "HRB 123456 / Amtsgericht Stuttgart", 0.97),
    ("USt-ID / Steuernummer", 0.95, "DE123456789", 0.98),
    ("Website (optional)", 0.95, "www.demotech.de", 0.99),
    ("Art der Immobilie", 0.95, "Gewerbeimmobilie - Bürogebäude", 0.96),
    ("Objektbezeichnung", 0.95, "InnovationsCampus Stuttgart", 0.97),
    ("Adresse", 0.95, "Innovationsntraße 1, 70469 Stuttgart", 0.96),
    ("Kaufpreis / Baukosten", 0.95, "4.200.000€", 0.98),
    ("Gewünschte Finanzierungssumme", 0.95, "3.500.000€", 0.98),
    ("Verwendungszweck", 0.95, "Kauf und Renovierung", 0.96),
    ("Eigenkapitalanteil", 0.95, "700.000€", 0.98),
    ("Baujahr", 0.95, "1995", 0.99),
    ("Fläche gesamt", 0.95, "2.800 m²", 0.97),
    ("Gewünschte Darlehenssumme", 0.95, "3.500.000€", 0.98),
    ("Laufzeit", 0.95, "20 Jahre", 0.99),
    ("Ratenwunsch", 0.95, "Ca. 18.000 € (monatlich)", 0.96),
    ("Zinssatz", 0.95, "Festzins, 3.2% p.a.", 0.97),
    ("Sondertilgungen gewünscht", 0.95, "[x] ja [ ] nein", 0.98),
    ("Öffentliche Fördermittel beantragt?", 0.95, "[ ] ja [x] nein", 0.98),
]


@pytest.fixture(scope="session")
def sample_ocr_lines() -> list[dict]:
    """The reference's 46-line (here 44: 22 label+value rows) form."""
    lines = []
    for row, (label, lc, value, vc) in enumerate(_FORM, start=1):
        lines.append(_line(label, 0.5, float(row), lc))
        lines.append(_line(value, 3.0, row + 0.01, vc))
    return lines


@pytest.fixture(scope="session")
def expected_pairs() -> list[tuple[str, str]]:
    return [(label, value) for (label, _, value, _) in _FORM]


@pytest.fixture(scope="session")
def doc_config():
    return default_config()
