"""Guard against silent pure-Python fallback: the C host extension
must build and load in CI — a broken build would otherwise let every
suite silently pass on the (bit-identical but far slower) Python
oracles, hiding native-path regressions entirely.  Found the hard
way: an implicit-declaration error once made 500+ tests 'pass' on
the fallback."""


def test_native_extension_available():
    from ffpic_tpu import native
    assert native.available(), (
        "native C extension failed to build/load; run "
        "`cc -O3 -march=native -fPIC -shared ffpic_tpu/native/*.c` "
        "to see the compile error")
