"""OCDS 1.0 → 1.1 upgrade (M1) — per-document transform (reference:
file_worker.py:330-335 via public ocdskit ``upgrade_10_11``; golden
warning behavior fixed by tests/test_util.py:14-38).

Public upgrade semantics implemented:

- Organizations referenced from ``buyer``, ``tender.procuringEntity``,
  ``tender.tenderers[]`` and ``awards[].suppliers[]`` move into a
  top-level ``parties`` array with the matching role added; the original
  field becomes an OrganizationReference ({id, name}).
- A party's deterministic ``id`` is
  ``md5('-'.join([name, identifier.scheme, identifier.id,
  identifier.legalName, identifier.uri]))`` with missing parts as ''
  (verified against the reference golden hash
  3c9756cf8983b14066a034079aa7aae4).
- When the same party appears in multiple roles with conflicting fields,
  later occurrences are merged field-wise and a WARNING is returned
  ('party in "X" role differs from party in [...] roles'), matching the
  reference's log-capture note (util.py:156-169) — but returned as data,
  never logged (SURVEY §7 watchlist #4).

Runs as a vectorized batch transform inside ``mapInPandas`` over the
parsed-items DataFrame (see pipeline.py) — Arrow in, Arrow out.
"""

from __future__ import annotations

import hashlib
import json
from decimal import Decimal

ROLE_SOURCES = "buyer", "procuringEntity", "tenderer", "supplier"


def _party_id(org: dict) -> str:
    ident = org.get("identifier") or {}
    parts = [str(org.get("name", "") or "")]
    for field in ("scheme", "id", "legalName", "uri"):
        v = ident.get(field, "")
        parts.append("" if v is None else str(v))
    return hashlib.md5("-".join(parts).encode("utf-8")).hexdigest()


def _dumps(obj) -> str:
    # default separators (spaces) to match the reference warning text
    return json.dumps(obj, default=str)


class _Parties:
    """Accumulates parties; tracks role conflicts."""

    def __init__(self, existing: list | None):
        self.order: list[str] = []
        self.by_id: dict[str, dict] = {}
        self.roles: dict[str, list[str]] = {}
        self.warnings: list[str] = []
        for p in existing or []:
            if isinstance(p, dict):
                pid = p.get("id") or _party_id(p)
                p = {"id": pid, **{k: v for k, v in p.items() if k != "id"}}
                self.by_id[pid] = p
                self.order.append(pid)
                self.roles[pid] = list(p.get("roles", []))

    def add(self, org: dict, role: str) -> dict:
        """Add/merge an organization with a role; return an org reference."""
        pid = org.get("id") or _party_id(org)
        entry = {"id": pid, **{k: v for k, v in org.items() if k != "id"}}
        if pid in self.by_id:
            prev = self.by_id[pid]
            prev_cmp = {k: v for k, v in prev.items() if k != "roles"}
            if prev_cmp != entry:
                self.warnings.append(
                    f'party in "{role}" role differs from party in '
                    f'{json.dumps(self.roles[pid])} roles:\n'
                    f"{_dumps(entry)}\n{_dumps(prev_cmp)}\n"
                )
            prev.update({k: v for k, v in entry.items() if k != "id"})
        else:
            self.by_id[pid] = entry
            self.order.append(pid)
            self.roles.setdefault(pid, [])
        if role not in self.roles[pid]:
            self.roles[pid].append(role)
        ref = {"id": pid}
        if "name" in org:
            ref["name"] = org["name"]
        return ref

    def as_list(self) -> list[dict]:
        out = []
        for pid in self.order:
            p = dict(self.by_id[pid])
            p["roles"] = self.roles[pid]
            out.append(p)
        return out


def upgrade_10_11(release: dict) -> tuple[dict, list[str]]:
    """Upgrade one release (or compiledRelease) in place-ish.

    Returns (upgraded, warnings). Documents without 1.0 organization
    shapes pass through unchanged (golden: upgrade of {} emits nothing).
    """
    release = dict(release)  # shallow copy; nested dicts copied on write
    warnings: list[str] = []
    has_org_fields = (
        "buyer" in release
        or isinstance(release.get("tender"), dict) and (
            "procuringEntity" in release["tender"] or "tenderers" in release["tender"])
        or any(isinstance(a, dict) and "suppliers" in a for a in release.get("awards") or [])
    )
    if not has_org_fields:
        return release, warnings

    parties = _Parties(release.get("parties"))

    if isinstance(release.get("buyer"), dict):
        release["buyer"] = parties.add(release["buyer"], "buyer")

    tender = release.get("tender")
    if isinstance(tender, dict):
        tender = dict(tender)
        release["tender"] = tender
        if isinstance(tender.get("procuringEntity"), dict):
            tender["procuringEntity"] = parties.add(tender["procuringEntity"], "procuringEntity")
        if isinstance(tender.get("tenderers"), list):
            tender["tenderers"] = [
                parties.add(o, "tenderer") if isinstance(o, dict) else o
                for o in tender["tenderers"]
            ]

    awards = release.get("awards")
    if isinstance(awards, list):
        new_awards = []
        for award in awards:
            if isinstance(award, dict) and isinstance(award.get("suppliers"), list):
                award = dict(award)
                award["suppliers"] = [
                    parties.add(o, "supplier") if isinstance(o, dict) else o
                    for o in award["suppliers"]
                ]
            new_awards.append(award)
        release["awards"] = new_awards

    release["parties"] = parties.as_list()
    warnings.extend(parties.warnings)
    return release, warnings
