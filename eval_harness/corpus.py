"""Synthetic evaluation corpus: deterministic multi-topic PDFs + labeled
ground-truth queries, so the quality evaluation runs hermetically (the
reference's ground truth points at a proprietary quant-finance PDF corpus
that does not ship with the repo)."""

from __future__ import annotations

import json
import os
import zlib
from typing import List

# Each topic: (document name, category, pages of text, queries with the
# gold page). Text is written so distinct topics share little vocabulary.
_TOPICS = [
    {
        "doc": "astronomy_handbook.pdf",
        "category": "science",
        "pages": [
            "STELLAR SPECTROSCOPY\n\nSpectral lines reveal the chemical "
            "composition of distant stars. Doppler shifts in these lines "
            "measure radial velocity of galaxies. Absorption features map "
            "stellar atmospheres in detail.",
            "EXOPLANET DETECTION\n\nTransit photometry detects planets when "
            "they dim their host star. Radial velocity wobbles expose the "
            "mass of orbiting companions. Direct imaging requires blocking "
            "the glare with a coronagraph.",
        ],
        "queries": [
            ("How do spectral lines reveal what stars are made of?", 1, "easy"),
            ("What methods detect planets orbiting other stars?", 2, "medium"),
        ],
    },
    {
        "doc": "bread_science.pdf",
        "category": "cooking",
        "pages": [
            "FERMENTATION BASICS\n\nWild yeast cultures leaven sourdough "
            "through slow fermentation. Lactic bacteria give the crumb its "
            "tangy flavor profile. Starter hydration controls the pace of "
            "microbial activity.",
            "GLUTEN DEVELOPMENT\n\nKneading aligns gluten proteins into an "
            "elastic network. Autolyse rests let flour hydrate before "
            "mixing begins. Proper tension shapes the final loaf structure.",
        ],
        "queries": [
            ("Why does sourdough taste tangy after fermentation?", 1, "easy"),
            ("How does kneading build structure in dough?", 2, "medium"),
        ],
    },
    {
        "doc": "portfolio_theory.pdf",
        "category": "finance",
        "pages": [
            "DIVERSIFICATION\n\nSpreading capital across uncorrelated assets "
            "reduces idiosyncratic risk. The efficient frontier charts the "
            "best achievable risk and return tradeoffs. Covariance between "
            "holdings drives portfolio variance.",
            "RISK MEASURES\n\nValue at risk estimates the maximum loss at a "
            "confidence level. Sharpe ratios compare excess return to "
            "volatility. Drawdown statistics capture sustained declines.",
        ],
        "queries": [
            ("How does diversification reduce portfolio risk?", 1, "easy"),
            ("What does value at risk measure for investors?", 2, "hard"),
        ],
    },
    {
        "doc": "alpine_flora.pdf",
        "category": "botany",
        "pages": [
            "CUSHION PLANTS\n\nAlpine cushion plants hug the ground to "
            "escape freezing winds. Dense hairy leaves trap warmth near the "
            "rosette. Slow growth lets them survive on thin rocky soils.",
            "POLLINATION AT ALTITUDE\n\nBumblebees dominate pollination "
            "above the treeline. Flowers track the sun to warm visiting "
            "insects. Short summers compress the entire blooming season.",
        ],
        "queries": [
            ("How do cushion plants survive alpine cold?", 1, "medium"),
            ("Which insects pollinate flowers above the treeline?", 2, "easy"),
        ],
    },
]

_REJECTION_QUERIES = [
    "What is the capital city of the moon federation?",
    "How do submarines bake sourdough at stellar altitude?",
]


def _make_pdf(pages: List[str]) -> bytes:
    """Minimal multi-page PDF writer (text via Tj operators)."""
    def esc(s: str) -> str:
        return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")

    objects: List[bytes] = []

    def add(obj: bytes) -> int:
        objects.append(obj)
        return len(objects)

    font = add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    contents = []
    for page in pages:
        ops = ["BT", "/F1 12 Tf", "72 720 Td"]
        for i, ln in enumerate(page.split("\n")):
            if i:
                ops.append("0 -16 Td")
            ops.append(f"({esc(ln)}) Tj")
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        comp = zlib.compress(stream)
        contents.append(
            add(
                b"<< /Length " + str(len(comp)).encode()
                + b" /Filter /FlateDecode >>\nstream\n" + comp + b"\nendstream"
            )
        )
    pages_obj = len(objects) + len(pages) + 1
    page_nums = [
        add(
            (
                f"<< /Type /Page /Parent {pages_obj} 0 R /MediaBox "
                f"[0 0 612 792] /Resources << /Font << /F1 {font} 0 R >> >> "
                f"/Contents {c} 0 R >>"
            ).encode()
        )
        for c in contents
    ]
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    pn = add(f"<< /Type /Pages /Kids [{kids}] /Count {len(page_nums)} >>".encode())
    assert pn == pages_obj
    cat = add(f"<< /Type /Catalog /Pages {pn} 0 R >>".encode())

    out = bytearray(b"%PDF-1.4\n")
    offsets = [0]
    for i, obj in enumerate(objects, 1):
        offsets.append(len(out))
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref = len(out)
    out += f"xref\n0 {len(objects)+1}\n".encode() + b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objects)+1} /Root {cat} 0 R >>\n"
        f"startxref\n{xref}\n%%EOF\n"
    ).encode()
    return bytes(out)


def generate_corpus(documents_dir: str) -> List[str]:
    """Write the synthetic PDFs; returns document names."""
    os.makedirs(documents_dir, exist_ok=True)
    names = []
    for topic in _TOPICS:
        path = os.path.join(documents_dir, topic["doc"])
        with open(path, "wb") as f:
            f.write(_make_pdf(topic["pages"]))
        names.append(topic["doc"])
    return names


def generate_ground_truth(path: str) -> int:
    """Write the JSONL ground truth; returns query count."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rows = []
    qn = 1
    for topic in _TOPICS:
        for query, page, difficulty in topic["queries"]:
            rows.append(
                {
                    "query_id": f"Q{qn:03d}",
                    "query": query,
                    "category": topic["category"],
                    "difficulty": difficulty,
                    "is_rejection": False,
                    "gold_references": [
                        {"document": topic["doc"], "page": page, "relevance": 3}
                    ],
                    "expected_answer_gist": "",
                    "notes": "synthetic",
                }
            )
            qn += 1
    for query in _REJECTION_QUERIES:
        rows.append(
            {
                "query_id": f"Q{qn:03d}",
                "query": query,
                "category": "rejection",
                "difficulty": "hard",
                "is_rejection": True,
                "gold_references": [],
                "expected_answer_gist": "no relevant content exists",
                "notes": "synthetic rejection",
            }
        )
        qn += 1
    with open(path, "w", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    return len(rows)
