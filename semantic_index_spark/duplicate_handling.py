"""Duplicate-handling policies for upsert.

Mirrors the reference enum (`/root/reference/ChatAIze.SemanticIndex/
DuplicateHandling.cs:7-28`): Allow (:12), Update (:17, the default per
`SemanticDatabase.cs:85`), Skip (:22), Throw (:27).
"""

from __future__ import annotations

from enum import Enum


class DuplicateHandling(str, Enum):
    """What to do when an incoming item's key equals an existing record's.

    ALLOW  — always append; duplicates coexist (`DuplicateHandling.cs:12`).
    UPDATE — remove ALL existing records with the key, then append — post-state
             has exactly one copy (`DuplicateHandling.cs:17`,
             `SemanticDatabase.cs:171-174`). Default.
    SKIP   — keep existing, drop the incoming duplicate (`DuplicateHandling.cs:22`).
    THROW  — raise on any duplicate (`DuplicateHandling.cs:27`).
    """

    ALLOW = "allow"
    UPDATE = "update"
    SKIP = "skip"
    THROW = "throw"


class DuplicateItemError(ValueError):
    """Raised by THROW policy, mirroring `SemanticDatabase.cs:179-182`."""
