"""Deterministic reference-shaped fixtures (FIXTURES.md): synthetic
documents_raw / document_info-adjacent tables mirroring the reference's
real schemas, for testing the regex extractors (F1–F6), the website
join/aggregate pipeline (E3), and incremental semantics (T1–T6)."""

from __future__ import annotations

import hashlib
import random

TITLES = [
    "SPECIAL INVESTIGATION REPORT",
    "RENEWAL INSPECTION REPORT",
    "LICENSING STUDY",
    "COMPLAINT INVESTIGATION REPORT",
    "INTERIM MONITORING REPORT",
    "CORRECTIVE ACTION PLAN",
]

FILLER = (
    "This facility was reviewed in accordance with applicable rules. "
    "Findings and observations are recorded below. "
) * 60  # > 3000 chars of filler


def make_documents_raw(n: int = 60, seed: int = 7) -> list[dict]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        sha = hashlib.sha256(f"doc-{i}".encode()).hexdigest()
        style = rng.randrange(6)
        lines = []
        license_no = f"CB{250000000 + i}"
        agency = f"AGENCY {i % 7} SERVICES - UNIT {i % 3}"
        inv_no = f"2024C{1000000 + i}"
        date_style = rng.randrange(3)
        if date_style == 0:
            date_line = f"Date(s) of On-site Inspection: 0{1 + i % 9}/1{i % 3}/202{i % 5}"
        elif date_style == 1:
            date_line = f"March {1 + i % 28}, 202{i % 5}"
        else:
            date_line = f"{1 + i % 12}/{1 + i % 28}/202{i % 5}"

        title = TITLES[i % len(TITLES)]
        is_sir = title == "SPECIAL INVESTIGATION REPORT"
        if style == 0:
            lines.append(f"Attached is the Special Investigation Report for {agency}")
            is_sir = True
        lines.append(title)
        if rng.random() < 0.9:
            lines.append(f"License #: {license_no}")
        else:
            license_no = None
        if rng.random() < 0.9:
            lines.append(f"Agency Name: {agency}")
        if is_sir:
            lines.append(f"Investigation #: {inv_no}")
        lines.append(date_line)
        page1 = "\n".join(lines)
        # A decoy title beyond the first 3000 chars must be ignored.
        page2 = FILLER + "\nSPECIAL INVESTIGATION REPORT (decoy beyond header)"
        rows.append(
            {
                "sha256": sha,
                "text": [page1, page2],
                "dateprocessed": "2026-01-01T00:00:00+00:00",
                "_license": license_no,
                "_is_sir": is_sir,
            }
        )
    return rows


def make_facilities(n_agencies: int = 7) -> list[dict]:
    statuses = ["Regular", "Original", "Closed", "Suspended"]
    return [
        {
            "LicenseNumber": f"CB{250000000 + i}",
            "AgencyName": f"AGENCY {i} SERVICES",
            "AgencyType": f"TYPE{i % 3}",
            "City": f"CITY{i % 4}",
            "County": f"COUNTY{i % 5}",
            "LicenseStatus": statuses[i % len(statuses)],
        }
        for i in range(n_agencies)
    ]
