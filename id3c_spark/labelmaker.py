"""Physical barcode label sheets (reference: lib/id3c/labelmaker.py).

The reference does NOT render PDFs itself — it builds a JSON "layout spec"
(sticker sheet SKU + per-barcode label entries with copies and blank
padding) and POSTs it to the public Lab Labels web service
(labelmaker.py:482-492, github.com/MullinsLab/Lab-Labels), which returns
the PDF bytes. Parity here is therefore:

  - the layout-spec builder, with the reference's exact spec shape
    (labelmaker.py:63-80 ``{"type": sku, "labels": [...]}``) and blank-
    padding rules: triplicate sheets (LCRY-1100, 4-wide) pad one blank
    before every barcode after the first (labelmaker.py:83-96); duplicate
    sheets (LCRY-2380, 7-wide) pad one blank before every 4th barcode
    (labelmaker.py:99-113);
  - the per-identifier-set registry (labelmaker.py:415-457) — the ~40
    reference subclasses collapse to data rows here, since they differ
    only in (sku, barcode label text, copies, reference url, pad rule);
  - ``generate_pdf`` posting the spec over an injectable transport
    (labelmaker.py:482-492), so tests stay offline.
"""

from __future__ import annotations

import json
import urllib.request
from collections.abc import Callable, Iterable, Sequence
from dataclasses import dataclass, field, replace

DEFAULT_LABEL_API = "https://lab-labels.seattleflu.org"

BLANK = {"text": "", "copies": 1}


def _pad_none(n: int) -> int:
    return 0


def _pad_row4(n: int) -> int:
    """Triplicate on a 4-wide sheet: blank before every barcode after the
    first keeps column 4 empty (labelmaker.py:83-96)."""
    return 1 if n > 1 else 0


def _pad_row7(n: int) -> int:
    """Duplicate on a 7-wide sheet: blank before every 4th barcode keeps
    column 7 empty (labelmaker.py:99-113)."""
    return 1 if n > 1 and (n - 1) % 3 == 0 else 0


@dataclass(frozen=True)
class LabelLayout:
    sku: str
    barcode_type: str
    reference: str
    copies_per_barcode: int = 1
    pad: Callable[[int], int] = _pad_none
    layouts: frozenset = frozenset({"default"})
    # 'small' CLIA variant drops the type+barcode text (labelmaker.py:244-268)
    small_text_only: bool = False

    def label(self, barcode: str) -> dict:
        if self.small_text_only:
            return {
                "text": self.reference,
                "barcode": barcode,
                "copies": self.copies_per_barcode,
            }
        return {
            "text": f"{self.barcode_type} {barcode}\n{self.reference or ''}",
            "barcode": barcode,
            "copies": self.copies_per_barcode,
        }

    def spec(self, barcodes: Sequence[str]) -> dict:
        labels: list[dict] = []
        for number, barcode in enumerate(barcodes, start=1):
            labels.extend([BLANK] * self.pad(number))
            labels.append(self.label(barcode))
        return {"type": self.sku, "labels": labels}


def _simple(sku: str, btype: str, ref: str, copies: int = 1) -> LabelLayout:
    return LabelLayout(sku=sku, barcode_type=btype, reference=ref, copies_per_barcode=copies)


def _triplicate(btype: str, ref: str) -> LabelLayout:
    return LabelLayout(
        sku="LCRY-1100", barcode_type=btype, reference=ref,
        copies_per_barcode=3, pad=_pad_row4,
    )


def _duplicate(btype: str, ref: str) -> LabelLayout:
    return LabelLayout(
        sku="LCRY-2380", barcode_type=btype, reference=ref,
        copies_per_barcode=2, pad=_pad_row7,
    )


SFS = "seattleflu.org"

# identifier-set name → layout (labelmaker.py:415-457). The reference's
# class-per-study hierarchy reduces to these parameter rows.
LAYOUTS: dict[str, LabelLayout] = {
    "samples": LabelLayout(
        sku="LCRY-2380", barcode_type="SAMPLE", reference=SFS,
        copies_per_barcode=2, pad=_pad_row7,
        layouts=frozenset({"default", "singlet"}),
    ),
    "collections-scan": _simple("LCRY-1100", "SCAN", "scanpublichealth.org", 2),
    "collections-scan-kiosks": _simple("LCRY-1100", "SCAN - STAVE", "scanpublichealth.org"),
    "collections-seattleflu.org": _simple("LCRY-1100", "COLLECTION", SFS),
    "collections-kiosks": _simple("LCRY-1100", "KIOSK", SFS, 2),
    "collections-kiosks-asymptomatic": _simple("LCRY-1100", "ASYMPTOMATIC KIOSK", SFS),
    "collections-environmental": _simple("LCRY-1100", "ENVIRON", SFS),
    "collections-swab&send": _triplicate("SWAB & SEND", SFS),
    "collections-household-observation": _triplicate("HH OBSERVATION", SFS),
    "collections-household-observation-asymptomatic": _simple("LCRY-1100", "ASYMPTOMATIC HH OBS", SFS),
    "collections-household-intervention": _triplicate("HH INTERVENTION", SFS),
    "collections-household-intervention-asymptomatic": _simple("LCRY-1100", "ASYMPTOMATIC HH INT", SFS),
    "collections-household-general": _simple("LCRY-1100", "HH GENERAL", SFS),
    "collections-self-test": _triplicate("HOME TEST", SFS),
    "collections-fluathome.org": _simple("LCRY-2380", "COLLECTION", "fluathome.org"),
    "collections-clia-compliance": LabelLayout(
        sku="LCRY-1100", barcode_type="CLIA", reference=SFS,
        layouts=frozenset({"default", "small"}),
    ),
    "kits-fluathome.org": _simple("LCRY-1100", "KIT", "fluathome.org"),
    "test-strips-fluathome.org": _simple("LCRY-2380", "TEST STRIP", "fluathome.org"),
    "samples-haarvi": _simple("LCRY-2380", "SAMPLE", "HAARVI"),
    "collections-haarvi": _simple("LCRY-1100", "COLLECTION", "HAARVI"),
    "collections-uw-observed": _simple("LCRY-1100", "UW OBSERVED", SFS),
    "collections-uw-home": _simple("LCRY-1100", "UW HOME", SFS, 2),
    "collections-childcare": _simple("LCRY-1100", "CHILDCARE", SFS),
    "collections-school-testing-home": _simple("LCRY-1100", "SCHOOL TESTING HOME", SFS, 2),
    "collections-school-testing-observed": _simple("LCRY-1100", "SCHOOL TESTING OBSERVED", SFS),
    "collections-apple-respiratory": _simple("LCRY-1100", "APPLE", SFS, 2),
    "collections-apple-respiratory-serial": _simple("LCRY-1100", "APPLE SERIAL", SFS, 2),
    "collections-adult-family-home-outbreak": _simple("LCRY-1100", "AFH OUTBREAK", SFS),
    "collections-workplace-outbreak": _simple("LCRY-1100", "WORKPLACE OUTBREAK", SFS),
    "collections-radxup-yakima-schools-home": _simple("LCRY-1100", "RADXUP YAKIMA HOME", SFS, 2),
    "collections-radxup-yakima-schools-observed": _simple("LCRY-1100", "RADXUP YAKIMA OBSERVED", SFS),
    "collections-uw-tiny-swabs": _simple("LCRY-2380", "UW TINY", SFS),
    "collections-uw-tiny-swabs-home": _simple("LCRY-2380", "UW TINY U", SFS),
    "collections-uw-tiny-swabs-observed": _simple("LCRY-2380", "UW TINY O", SFS),
    "collections-scan-tiny-swabs": _simple("LCRY-2380", "SCAN TINY", "scanpublichealth.org"),
    "collections-adult-family-home-outbreak-tiny-swabs": _simple("LCRY-2380", "AFH TINY", SFS),
    "collections-workplace-outbreak-tiny-swabs": _simple("LCRY-2380", "WORK TINY", SFS),
    "collections-airs": _simple("LCRY-1100", "AIRS", "fredhutch.org", 2),
    "collections-cascadia-tiny-swabs-home": _duplicate("CASCADIA", "cascadiastudy.org"),
}


def layout_identifiers(
    set_name: str,
    identifiers: Iterable,
    layout: str = "default",
    copies_per_barcode: int | None = None,
) -> tuple[LabelLayout, list[str]]:
    """Layout + barcodes for an identifier set (labelmaker.py:461-476).
    Items in *identifiers* must have a ``barcode`` attribute (or be plain
    strings)."""
    base = LAYOUTS[set_name]
    if layout not in base.layouts:
        raise NotImplementedError(f"layout must be one of: {set(base.layouts)}")
    if layout == "singlet":
        base = replace(base, copies_per_barcode=1, pad=_pad_none)
    elif layout == "small":
        base = replace(base, sku="LCRY-2380", small_text_only=True)
    if copies_per_barcode:
        base = replace(base, copies_per_barcode=copies_per_barcode)
    barcodes = [getattr(i, "barcode", i) for i in identifiers]
    return base, barcodes


def generate_pdf(
    layout: LabelLayout,
    barcodes: Sequence[str],
    api: str = DEFAULT_LABEL_API,
    transport: Callable[[str, bytes, dict], bytes] | None = None,
) -> bytes:
    """POST the layout spec to the Lab Labels ``/stickers`` endpoint and
    return the PDF bytes (labelmaker.py:482-492). *transport* is injectable
    for offline tests / custom auth."""
    spec = json.dumps(layout.spec(barcodes))

    def default_transport(url: str, data: bytes, headers: dict) -> bytes:
        req = urllib.request.Request(url, data=data, headers=headers, method="POST")
        with urllib.request.urlopen(req) as resp:
            return resp.read()

    send = transport or default_transport
    return send(
        f"{api}/stickers",
        spec.encode(),
        {"Content-Type": "application/json"},
    )
