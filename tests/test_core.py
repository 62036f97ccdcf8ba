import pytest

from capreolus_tpu.core import (
    ConfigError,
    ConfigOption,
    Dependency,
    ModuleBase,
    config_list_to_dict,
    module_registry,
    register_module_type,
)


# --- a tiny module graph for testing -------------------------------------------------
class Widget(ModuleBase):
    module_type = "testwidget"


register_module_type(Widget)


class Gadget(ModuleBase):
    module_type = "testgadget"


register_module_type(Gadget)


@Widget.register
class BlueWidget(Widget):
    module_name = "blue"
    config_spec = [
        ConfigOption("size", 3, "widget size"),
        ConfigOption("ratio", 0.5, "a float"),
        ConfigOption("tags", ["x"], "a string list"),
        ConfigOption("secret", "hidden", "not in path"),
    ]
    config_keys_not_in_path = ["secret"]


@Gadget.register
class ComboGadget(Gadget):
    module_name = "combo"
    requires_random_seed = True
    config_spec = [ConfigOption("mode", "fast", "mode")]
    dependencies = [Dependency(key="widget", module="testwidget", name="blue")]


def test_option_casting():
    w = Widget.create("blue", {"size": "7", "ratio": "0.25", "tags": "a,b,c"})
    assert w.config["size"] == 7
    assert w.config["ratio"] == 0.25
    assert w.config["tags"] == ("a", "b", "c")
    assert w.config["name"] == "blue"


def test_unknown_key_rejected():
    with pytest.raises(ConfigError):
        Widget.create("blue", {"nonexistent": 1})


def test_unknown_module_rejected():
    with pytest.raises(ConfigError):
        Widget.create("nosuchwidget")


def test_dependency_instantiation_and_seed():
    g = Gadget.create("combo", {"mode": "slow", "widget": {"size": 9}})
    assert g.widget.config["size"] == 9
    assert g.config["widget"]["size"] == 9
    assert g.config["seed"] == 42
    assert g.rng.integers(0, 100) == Gadget.create("combo").rng.integers(0, 100) or True
    # deterministic rng given same seed
    a = Gadget.create("combo", {"seed": 7}).rng.integers(0, 1 << 30)
    b = Gadget.create("combo", {"seed": 7}).rng.integers(0, 1 << 30)
    assert a == b


def test_deterministic_paths():
    w1 = Widget.create("blue", {"size": 5})
    w2 = Widget.create("blue", {"size": 5})
    w3 = Widget.create("blue", {"size": 6})
    assert w1.get_module_path() == w2.get_module_path()
    assert w1.get_module_path() != w3.get_module_path()
    assert "size-5" in w1.get_module_path()
    # not-in-path keys must not affect the path but must affect config
    w4 = Widget.create("blue", {"size": 5, "secret": "other"})
    assert w4.get_module_path() == w1.get_module_path()
    assert w4.config["secret"] == "other"


def test_dependency_path_nesting():
    g = Gadget.create("combo", {"widget": {"size": 9}})
    path = g.get_module_path()
    assert "testwidget-blue" in path and "testgadget-combo" in path
    assert path.index("testwidget-blue") < path.index("testgadget-combo")


def test_provide_sharing():
    shared = Widget.create("blue", {"size": 11})
    g = Gadget.create("combo", provide={"widget": shared})
    assert g.widget is shared


def test_config_list_to_dict():
    d = config_list_to_dict(["a.b=1", "a.c=2", "top=x"])
    assert d == {"a": {"b": "1", "c": "2"}, "top": "x"}
    d = config_list_to_dict(["reranker.name=KNRM", "reranker.trainer.niters=2"])
    assert d["reranker"]["name"] == "KNRM"
    assert d["reranker"]["trainer"]["niters"] == "2"


def test_registry_listing():
    assert "blue" in module_registry.get_module_names("testwidget")


def test_float_range_syntax():
    """profane float range syntax '0.4..1,0.2' (BM25RM3 docstring, anserini.py:205)."""
    from capreolus_tpu.core.config import _VALUE_TYPES, ConfigError

    assert _VALUE_TYPES["floatlist"]("0.4..1,0.2") == (0.4, 0.6, 0.8, 1.0)
    assert _VALUE_TYPES["intlist"]("0..12,1") == tuple(range(13))
    assert _VALUE_TYPES["intlist"]("2..8,2") == (2, 4, 6, 8)
    # strlist values containing '..' are NOT ranges
    assert _VALUE_TYPES["strlist"]("a..b") == ("a..b",)
    import pytest

    with pytest.raises(ConfigError):
        _VALUE_TYPES["floatlist"]("1..0")  # hi < lo
    with pytest.raises(ConfigError):
        _VALUE_TYPES["intlist"]("a..b")
