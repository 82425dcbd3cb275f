"""Synthesize openfootball-shaped fixtures (FIXTURES.md §A)."""

from __future__ import annotations

import json
import os


def _m(round_, date, t1, t2, ft=None, ht=None, time=None):
    m = {"round": round_, "date": date, "team1": t1, "team2": t2}
    if time:
        m["time"] = time
    score = {}
    if ht is not None:
        score["ht"] = ht
    if ft is not None:
        score["ft"] = ft
    m["score"] = score
    return m


# League "en.1" season 2015: flat shape. Arsenal wins (2W), Chelsea 1W1L,
# Leeds 0W... designed so champion + standings are hand-checkable.
FLAT_DOC = {
    "name": "English Premier League 2015/16",
    "season": "2015/16",
    "matches": [
        _m("Matchday 1", "2015-08-08", "Arsenal", "Chelsea", ft=[2, 1], ht=[1, 0]),
        _m("Matchday 1", "2015-08-08", "Leeds United", "Man Utd", ft=[0, 0]),
        _m("Matchday 2", "2015-08-15", "Chelsea", "Leeds United", ft=[3, 0]),
        _m("Matchday 2", "2015-08-15", "Man Utd", "Arsenal", ft=[1, 2]),
        # unplayed match: no ft score → null winner, 0 points, not counted
        _m("Matchday 3", "2015-08-22", "Arsenal", "Leeds United"),
    ],
}

# League "de.1" season 2015: rounds-nested shape (main.yml:132 variant).
# Bayern 2W, Dortmund 1W1L, Koeln 0W1D1L, Mainz 0W1D1L.
ROUNDS_DOC = {
    "name": "Deutsche Bundesliga 2015/16",
    "rounds": [
        {
            "name": "Spieltag 1",
            "matches": [
                _m(None, "2015-08-14", "Bayern", "Dortmund", ft=[2, 0]),
                _m(None, "2015-08-14", "Koeln", "Mainz", ft=[1, 1]),
            ],
        },
        {
            "name": "Spieltag 2",
            "matches": [
                _m(None, "2015-08-21", "Dortmund", "Koeln", ft=[3, 1]),
                _m(None, "2015-08-21", "Mainz", "Bayern", ft=[0, 1]),
            ],
        },
    ],
}

# Superseded older version of en.1 — must be ignored (natural version:
# the v2 file below wins; the base file has version 0... the reference
# keeps the *last* in `sort -V`, so en.1.v2.json > en.1.json).
FLAT_DOC_V1_STALE = {
    "name": "English Premier League 2015/16",
    "season": "2015/16",
    "matches": [
        _m("Matchday 1", "2015-08-08", "WRONG TEAM", "Chelsea", ft=[9, 9]),
    ],
}

LEAGUES = [("en", "English Premier League"), ("de", "Deutsche Bundesliga")]

ALIASES = [
    ("Man Utd", "Manchester United"),
    ("Manchester United FC", "Manchester United"),
]


def write_fixture_tree(root: str) -> str:
    """Lay out raw/<season-dir>/<file>.json like the reference raw zone."""
    d = os.path.join(root, "2015-16")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "en.1.json"), "w") as fh:
        json.dump(FLAT_DOC_V1_STALE, fh)
    with open(os.path.join(d, "en.1.v2.json"), "w") as fh:
        json.dump(FLAT_DOC, fh)
    with open(os.path.join(d, "de.1.json"), "w") as fh:
        json.dump(ROUNDS_DOC, fh)
    # malformed JSON → quarantine (P5)
    with open(os.path.join(d, "fr.1.json"), "w") as fh:
        fh.write('{"name": "broken", "matches": [')
    # missing required fields → quarantine (P7)
    with open(os.path.join(d, "es.1.json"), "w") as fh:
        json.dump({"season": "2015/16"}, fh)
    # unknown league code → dropped by J1 inner join (P9)
    with open(os.path.join(d, "zz.9.json"), "w") as fh:
        json.dump(
            {"name": "Mystery League", "season": "2015/16",
             "matches": [_m("R1", "2015-08-08", "A", "B", ft=[1, 0])]},
            fh,
        )
    return root
