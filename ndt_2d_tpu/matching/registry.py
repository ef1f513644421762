"""Matcher registry: string-keyed construction of scan matchers.

Plays the role of the reference's pluginlib indirection
(src/ndt_mapper.cpp:54, :299-312; plugins.xml): the mapper instantiates
matchers by type string so alternative matchers can be swapped in via
configuration without touching the mapper.
"""

from __future__ import annotations

from typing import Callable, Dict

from ndt_2d_tpu.config import ScanMatcherConfig
from ndt_2d_tpu.matching.matcher import NDTScanMatcher

_REGISTRY: Dict[str, Callable[[ScanMatcherConfig, float], object]] = {}


def register(name: str, factory) -> None:
    _REGISTRY[name] = factory


def create(name: str, config: ScanMatcherConfig, range_max: float):
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown scan_matcher_type {name!r}; known: {sorted(_REGISTRY)}")
    return factory(config, range_max)


register("ndt", NDTScanMatcher)
# Alias matching the reference's pluginlib class path for config parity.
register("ndt_2d::ScanMatcherNDT", NDTScanMatcher)


def _correlative(config: ScanMatcherConfig, range_max: float):
    from ndt_2d_tpu.matching.correlative import CorrelativeScanMatcher
    return CorrelativeScanMatcher(config, range_max)


# Alternative matcher implementation (the ndt_2d_karto-style swap the
# reference's plugin architecture exists for, README.md:6-10).
register("correlative", _correlative)


def _ndt_newton(config: ScanMatcherConfig, range_max: float):
    """NDT matcher with Newton sub-lattice polish enabled (default 10 iters
    unless the config already sets refine_iterations)."""
    import dataclasses
    if config.refine_iterations == 0:
        config = dataclasses.replace(config, refine_iterations=10)
    return NDTScanMatcher(config, range_max)


register("ndt_newton", _ndt_newton)
