"""Relational + custom operators: LWW dedup, CDC merge, revoke-by-absence,
dedup/similarity suites, top-k. All DataFrame-native; shuffles are explicit
and documented per operator."""
