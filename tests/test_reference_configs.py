"""Every config file the reference distributes must parse and instantiate here.

The reference ships ready-to-run experiment configs (docs/reproduction/
config_*.txt, loaded with ``file=``); module/option-name compatibility is a
stated goal, so each of them must build a full task dependency graph through
our config system without ConfigError. Copies live in
docs/reproduction/configs/ (config data)."""

from pathlib import Path

import pytest

import capreolus_tpu

capreolus_tpu.load_all_modules()

from capreolus_tpu.run import _load_config_file, parse_task_string, prepare_task
from capreolus_tpu.core import config_list_to_dict, merge_config_dicts

CONFIG_DIR = Path(__file__).parent.parent / "docs" / "reproduction" / "configs"
CONFIGS = sorted(CONFIG_DIR.glob("config_*.txt"))

# reranker.name is commented out inside these files; the reference docs pass it
# on the command line alongside file= (docs/reproduction/MS_MARCO.md)
EXTRA_ARGS = {
    "config_msmarco.txt": ["reranker.name=TFBERTMaxP"],
    "config_msmarco_lce.txt": [],
}


@pytest.mark.parametrize("path", CONFIGS, ids=lambda p: p.name)
def test_reference_config_instantiates(tmpdir_as_cache, path):
    pairs = _load_config_file(path) + EXTRA_ARGS.get(path.name, [])
    config = config_list_to_dict(pairs)
    task, command = parse_task_string("rerank.describe")
    instance = prepare_task("rerank.describe", config)[0]
    assert instance is not None
    # the graph resolved the configured modules, not silent defaults
    flat = instance.config
    if "pretrained" in config.get("reranker", {}):
        assert flat["reranker"]["pretrained"] == config["reranker"]["pretrained"]
