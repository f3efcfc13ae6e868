"""Doctest-as-spec runner for modules carrying inline examples."""
import doctest

import pytest

import glimpse_tpu.camera
import glimpse_tpu.helpers
import glimpse_tpu.raster


@pytest.mark.parametrize(
    "module",
    [glimpse_tpu.helpers, glimpse_tpu.camera, glimpse_tpu.raster],
)
def test_module_doctests(module) -> None:
    results = doctest.testmod(
        module, optionflags=doctest.NORMALIZE_WHITESPACE | doctest.ELLIPSIS
    )
    assert results.failed == 0, f"{results.failed} doctest failures in {module}"
    assert results.attempted > 0
