"""Config system tests: YAML is actually parsed (unlike the reference's
unread config/*.yaml — SURVEY.md §2.4 #38), CLI overrides win, presets match
the attack table."""

import os

import pytest

from audiobd_tpu.configs import (
    ATTACK_PRESETS,
    config_from_yaml,
    linear_features_for,
    make_config,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("attack", list(ATTACK_PRESETS))
def test_yaml_files_load(attack):
    cfg = config_from_yaml(os.path.join(REPO, "configs", f"{attack}.yaml"))
    assert cfg.name == attack
    preset = ATTACK_PRESETS[attack]["dsp"]
    assert cfg.dsp.sample_rate == preset["sample_rate"]
    assert cfg.dsp.n_fft == preset["n_fft"]
    assert cfg.train.seed == 35
    assert cfg.train.batch_size == 256


def test_cli_overrides_yaml():
    cfg = config_from_yaml(
        os.path.join(REPO, "configs", "badnets.yaml"),
        batch_size=64, model="resnet", poisoning_rate=0.2,
    )
    assert cfg.train.batch_size == 64
    assert cfg.model == "resnet"
    assert cfg.poisoning_rate == 0.2
    assert cfg.dsp.n_fft == 400  # untouched YAML value


def test_unknown_key_rejected():
    with pytest.raises(KeyError):
        make_config("badnets", not_a_real_key=1)


def test_feature_table_complete():
    for attack in ATTACK_PRESETS:
        for model in ("smallcnn", "largecnn", "smalllstm", "lstmwithattention", "rnn", "resnet"):
            assert linear_features_for(attack, model) > 0


def test_dispatcher_lists_commands():
    from audiobd_tpu.__main__ import COMMANDS

    for name in ("badnets", "jingleback", "ultrasonic", "daba", "flowmur",
                 "fp", "ft_reg", "tsbd", "correlation_analysis", "get_dataset"):
        assert name in COMMANDS
