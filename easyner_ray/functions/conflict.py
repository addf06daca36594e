"""Overlapping-mention conflict resolution (reference merger2 semantics).

The reference resolves overlaps between mentions from different NER runs
with a class-priority map and span rules (reference
``entity_merger2.py:99-146``): priority chemical < disease < species < gene
< cell (``:116``); identical spans keep the higher-priority class; a span
contained in another is dropped (``:127-131``); for partial overlaps the
shorter span is dropped (``:133-139``).

Engine realization: greedy accept in (longer, higher-priority,
earlier-start) order, rejecting any mention that overlaps an accepted one.
This reproduces all three reference rules in one deterministic pass; output
is a non-overlapping mention list re-sorted by (start, end) with
``mention_idx`` reassigned.
"""

from __future__ import annotations

from easyner_ray.sources.vocab import CLASS_PRIORITY


def resolve_conflicts(mentions: list[dict]) -> list[dict]:
    """mentions: list of mention-struct dicts (surface, norm, cls, start,
    end, mention_idx). Returns the kept, reindexed list."""
    if len(mentions) <= 1:
        return [dict(m, mention_idx=i) for i, m in enumerate(mentions)]

    order = sorted(
        mentions,
        key=lambda m: (
            -(m["end"] - m["start"]),
            -CLASS_PRIORITY.get(m["cls"], 0),
            m["start"],
            m["cls"],
        ),
    )
    kept: list[dict] = []
    for m in order:
        if all(m["end"] <= k["start"] or m["start"] >= k["end"] for k in kept):
            kept.append(m)
    kept.sort(key=lambda m: (m["start"], m["end"]))
    return [dict(m, mention_idx=i) for i, m in enumerate(kept)]
