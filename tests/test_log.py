"""Logging env-filter (ref model: bevy_log LogPlugin + EnvFilter
directive behavior)."""

import io

from bevy_tpu.log import LEVELS, EnvFilter, Logger


def test_env_filter_levels():
    f = EnvFilter("warn")
    assert not f.enabled("anything", LEVELS["info"])
    assert f.enabled("anything", LEVELS["warn"])
    assert f.enabled("anything", LEVELS["error"])


def test_env_filter_module_override():
    f = EnvFilter("info,bevy_tpu.render=debug,bevy_tpu.render.sprite=warn")
    assert f.enabled("bevy_tpu.render", LEVELS["debug"])
    assert not f.enabled("bevy_tpu.ecs", LEVELS["debug"])
    # longest-prefix wins
    assert not f.enabled("bevy_tpu.render.sprite", LEVELS["debug"])
    assert f.enabled("bevy_tpu.render.sprite", LEVELS["warn"])
    assert f.enabled("bevy_tpu.render.mesh3d", LEVELS["debug"])


def test_logger_output_and_once():
    buf = io.StringIO()
    log = Logger(EnvFilter("info"), stream=buf, timestamps=False)
    log.debug("mod", "hidden")
    log.info("mod", "shown")
    log.warn_once("mod", "dup")
    log.warn_once("mod", "dup")
    out = buf.getvalue()
    assert "hidden" not in out
    assert "INFO  mod: shown" in out
    assert out.count("dup") == 1
