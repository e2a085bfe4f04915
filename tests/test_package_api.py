"""Top-level package surface: every lazy alias resolves to a real symbol.

Guards the PEP 562 re-export table in weatherforecastingtoolkit_tpu/__init__.py
against renames in the underlying modules (a stale entry would otherwise only
fail at first user access).
"""

import weatherforecastingtoolkit_tpu as wx


def test_version_and_eager_exports():
    assert wx.__version__
    assert callable(wx.calc_metrics)
    assert wx.Config is not None


def test_every_lazy_alias_resolves():
    for name in wx._LAZY:
        obj = getattr(wx, name)
        assert obj is not None, name
        # second access hits the cached global, not __getattr__
        assert getattr(wx, name) is obj


def test_dir_lists_lazy_names():
    listing = dir(wx)
    assert "Trainer" in listing and "SEVIRDataModule" in listing


def test_unknown_attribute_raises():
    try:
        wx.does_not_exist
    except AttributeError as e:
        assert "does_not_exist" in str(e)
    else:  # pragma: no cover
        raise AssertionError("expected AttributeError")
