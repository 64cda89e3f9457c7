"""utils.platform.parse_flag: pre-argparse argv scanning for the flags that
must be applied before the JAX backend initializes (--local-devices,
--num-processes, --coordinator, --process-id). Both argparse spellings are
accepted (round-4 advisor: '--local-devices=8' was silently missed, so the
backend initialized with the wrong CPU device count)."""

from active_tracking_rl_tpu.utils.platform import parse_flag


def test_space_form():
    assert parse_flag(["prog", "--local-devices", "8"],
                      "--local-devices", int) == 8


def test_equals_form():
    assert parse_flag(["prog", "--local-devices=8"],
                      "--local-devices", int) == 8
    assert parse_flag(["prog", "--coordinator=host:1234"],
                      "--coordinator", str) == "host:1234"


def test_absent_and_malformed():
    assert parse_flag(["prog"], "--local-devices", int) is None
    assert parse_flag(["prog", "--local-devices", "x"],
                      "--local-devices", int) is None
    assert parse_flag(["prog", "--local-devices=x"],
                      "--local-devices", int) is None
    # trailing flag with no value
    assert parse_flag(["prog", "--local-devices"],
                      "--local-devices", int) is None


def test_prefix_is_not_a_match():
    # '--local-devices-extra 4' must not be read as --local-devices
    assert parse_flag(["prog", "--local-devices-extra", "4"],
                      "--local-devices", int) is None
