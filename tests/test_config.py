import pytest

from tpuvc.config import (
    DatasetConfig,
    TestConfig,
    TrainConfig,
    UVG_SEQUENCES,
    apply_overrides,
    load_yaml,
)


class TestConfigSchema:
    def test_defaults_cover_uvg(self):
        cfg = TestConfig()
        assert cfg.dataset.sequences == UVG_SEQUENCES
        assert cfg.dataset.sequences["shakendry"] == 300
        assert len(cfg.betas_mse) == 5

    def test_dotted_overrides(self):
        cfg = TestConfig()
        apply_overrides(
            cfg,
            [
                "model.family=lhbdc",
                "model.N=64",
                "dataset.gop=8",
                "levels=(0,2)",
                "adaptive_down_ratio=False",
            ],
        )
        assert cfg.model.family == "lhbdc"
        assert cfg.model.N == 64
        assert cfg.dataset.gop == 8
        assert cfg.levels == (0, 2)
        assert cfg.adaptive_down_ratio is False

    def test_string_override_not_evaled(self):
        cfg = TestConfig()
        apply_overrides(cfg, ["results_csv=out(1).csv"])
        assert cfg.results_csv == "out(1).csv"

    def test_yaml_round_trip(self, tmp_path):
        p = tmp_path / "cfg.yaml"
        p.write_text(
            "model:\n  family: deform_b\n  N: 32\n"
            "dataset:\n  gop: 8\n  sequences:\n    beauty: 10\n"
            "levels: [1, 2]\n"
        )
        cfg = load_yaml(str(p))
        assert cfg.model.family == "deform_b"
        assert cfg.model.N == 32
        assert cfg.dataset.gop == 8
        assert cfg.dataset.sequences == {"beauty": 10}
        assert cfg.levels == [1, 2]

    def test_repo_example_configs_parse(self):
        cfg = load_yaml("configs/test.yaml")
        assert cfg.model.family == "flowguided_b"
        assert cfg.dataset.sequences["beauty"] == 600
        tcfg = load_yaml("configs/train_flowguided.yaml", TrainConfig)
        assert tcfg.total_steps == 750000
        assert tcfg.stage2_start == 350000

    def test_timestamped_output_override(self):
        cfg = TestConfig()
        assert cfg.timestamped_output is False
        apply_overrides(cfg, ["timestamped_output=True"])
        assert cfg.timestamped_output is True
