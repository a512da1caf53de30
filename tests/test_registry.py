import pytest

from hawkeye_tpu.registry import Repository


def test_register_and_get():
    repo = Repository("t")

    @repo.register
    def foo():
        return 1

    assert repo.get("foo") is foo
    assert "foo" in repo


def test_register_with_name():
    repo = Repository("t")

    @repo.register(name="Bar")
    class X:
        pass

    assert repo.get("Bar") is X


def test_duplicate_asserts():
    repo = Repository("t")
    repo.register(lambda: 0, name="dup")
    with pytest.raises(AssertionError):
        repo.register(lambda: 1, name="dup")


def test_get_missing_raises():
    repo = Repository("t")
    with pytest.raises(KeyError):
        repo.get("nope")
