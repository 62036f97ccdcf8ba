"""capreolus_tpu: a TPU-native ad hoc retrieval framework.

A from-scratch rebuild of the capability surface of Capreolus
(capreolus-ir/capreolus, mounted read-only at /root/reference) designed TPU-first:
the Lucene/Anserini search backend is replaced by an HBM-resident inverted index
scored with JAX/XLA/Pallas kernels, the torch/TF double model zoo by a single JAX
model zoo, and the two trainers by one jit/pjit trainer (see SURVEY.md).
"""

__version__ = "0.1.0"

from capreolus_tpu.core import (
    ConfigError,
    ConfigOption,
    Dependency,
    ModuleBase,
    config_list_to_dict,
    config_string_to_dict,
    constants,
    module_registry,
)
from capreolus_tpu.utils import get_logger

_MODULE_PACKAGES = (
    "collection",
    "benchmark",
    "index",
    "searcher",
    "tokenizer",
    "extractor",
    "sampler",
    "reranker",
    "trainer",
    "task",
)

_loaded = False


def load_all_modules():
    """Import every module-type package so @register decorators run.

    Equivalent to the eager imports in /root/reference/capreolus/__init__.py:40-58,
    but callable lazily to keep `import capreolus_tpu` light.
    """
    global _loaded
    if _loaded:
        return
    import importlib

    for pkg in _MODULE_PACKAGES:
        importlib.import_module(f"capreolus_tpu.{pkg}")
    _loaded = True


def parse_config_string(config_string: str) -> dict:
    """Parse a whitespace-delimited 'a.b=1 c=2' string into a nested config dict."""
    return config_string_to_dict(config_string)


__all__ = [
    "ConfigError",
    "ConfigOption",
    "Dependency",
    "ModuleBase",
    "config_list_to_dict",
    "constants",
    "get_logger",
    "load_all_modules",
    "module_registry",
    "parse_config_string",
]
