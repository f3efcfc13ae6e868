"""Doctest-as-spec runner for modules carrying inline examples."""
import doctest

import pytest

import glimpse_tpu.helpers


@pytest.mark.parametrize("module", [glimpse_tpu.helpers])
def test_module_doctests(module) -> None:
    results = doctest.testmod(
        module, optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {module}"
    assert results.attempted > 0
