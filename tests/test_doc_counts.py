"""Doc-count rot gate (VERDICT r5 item 6 — second round of this class).

The registry key count is hand-written in three public places; this test
pins each of them to ``len(registry.QUERIES)`` so a drifted number fails
CI instead of rotting in prose.
"""

from __future__ import annotations

import re
from pathlib import Path

import kwery_spark.all_ops  # noqa: F401  (populates the registry)
from kwery_spark import engine, registry

REPO = Path(__file__).resolve().parent.parent


def _live() -> int:
    return len(registry.QUERIES)


def test_engine_docstring_count():
    m = re.search(r"\((\d+) as of round", engine.__doc__)
    assert m, "engine.py docstring lost its key-count sentence"
    assert int(m.group(1)) == _live(), (
        f"engine.py docstring says {m.group(1)}, registry has {_live()}"
    )


def test_survey_2_12_count():
    text = (REPO / "SURVEY.md").read_text()
    m = re.search(r"registry\ntotal (\d+) keys / (\d+) oracles", text)
    assert m, "SURVEY.md §2.12 lost its registry-total sentence"
    assert int(m.group(1)) == _live() and int(m.group(2)) == _live(), (
        f"SURVEY.md says {m.group(1)}/{m.group(2)}, registry has {_live()}"
    )


def test_readme_counts():
    text = (REPO / "README.md").read_text()
    nums = {int(n) for n in re.findall(r"(\d+) (?:registered )?operators", text)}
    assert nums, "README.md lost its operator-count sentences"
    assert nums == {_live()}, f"README.md counts {sorted(nums)} != registry {_live()}"


def test_every_key_has_oracle():
    missing = [k for k, v in registry.QUERIES.items() if not registry.ORACLES.get(k)]
    assert not missing, f"keys without oracle SQL: {missing}"
