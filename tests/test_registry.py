import pytest

from videoswap_tpu.utils import Registry, load_config


def test_registry_roundtrip():
    reg = Registry('test')

    @reg.register()
    class Foo:
        pass

    assert reg.get('Foo') is Foo
    assert 'Foo' in reg
    with pytest.raises(KeyError):
        reg.get('Bar')
    with pytest.raises(KeyError):
        @reg.register()
        class Foo:  # noqa: F811
            pass


def test_config_loader(tmp_path):
    p = tmp_path / 'c.yml'
    p.write_text(
        'name: exp1\nlr: !!float 5e-4\nnested:\n  a: ~\n  b: [1, 2]\n')
    cfg = load_config(str(p))
    assert cfg['name'] == 'exp1'
    assert cfg['lr'] == 5e-4
    assert cfg['nested']['a'] is None
    assert cfg['nested']['b'] == [1, 2]
