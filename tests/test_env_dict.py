"""Port of the reference env-dict table (internal/env/dict_test.go:
104-490): typed accessors with ${VAR} substitution, comma-separated
slice parsing, native passthrough, and missing-env errors — all ~45
cases against functions.config.EnvDict."""

import pytest

from tegola_spark.functions import config as C

E = {"TEST_STRING": "foo", "TEST_BOOL": "true", "TEST_INT": "-1",
     "TEST_UINT": "1", "TEST_FLOAT": "1.0"}
ES = {"TEST_STRING": "foo, bar", "TEST_BOOL": "true, false",
      "TEST_INT_SLICE": "123, -324", "TEST_UINT_SLICE": "123, 324",
      "TEST_FLOAT_SLICE": "123.0, 324.0"}

# (dict, env, accessor, key, expected) — expected=C.MissingEnvVar means
# the case raises
CASES = [
    ({"string": "${TEST_STRING}"}, E, "string", "string", "foo"),
    ({"string": "foo"}, {}, "string", "string", "foo"),
    ({"string": "${TEST_STRING}"}, {}, "string", "string", C.MissingEnvVar),
    ({"string_slice": "${TEST_STRING}"}, ES, "string_slice", "string_slice",
     ["foo", "bar"]),
    ({"string_slice": ["foo", "bar", "baz"]}, {}, "string_slice",
     "string_slice", ["foo", "bar", "baz"]),
    ({"string_slice": "foo, bar,  baz"}, {}, "string_slice", "string_slice",
     ["foo", "bar", "baz"]),
    ({"string_slice": "${TEST_STRING}"}, {}, "string_slice", "string_slice",
     C.MissingEnvVar),
    ({}, {}, "string_slice", "string_slice", []),
    ({"bool": "${TEST_BOOL}"}, E, "bool", "bool", True),
    ({"bool": True}, {}, "bool", "bool", True),
    ({"bool": "${TEST_BOOL}"}, {}, "bool", "bool", C.MissingEnvVar),
    ({"bool_slice": "${TEST_BOOL}"}, ES, "bool_slice", "bool_slice",
     [True, False]),
    ({"bool_slice": [True, False, True]}, {}, "bool_slice", "bool_slice",
     [True, False, True]),
    ({"bool_slice": "true, false,  true"}, {}, "bool_slice", "bool_slice",
     [True, False, True]),
    ({"bool_slice": "${TEST_BOOL}"}, {}, "bool_slice", "bool_slice",
     C.MissingEnvVar),
    ({}, {}, "bool_slice", "bool_slice", []),
    ({"int": "${TEST_INT}"}, E, "int", "int", -1),
    ({"int": -1}, {}, "int", "int", -1),
    ({"int": "${TEST_INT}"}, {}, "int", "int", C.MissingEnvVar),
    ({"int_slice": "${TEST_INT_SLICE}"}, ES, "int_slice", "int_slice",
     [123, -324]),
    ({"int_slice": [43, -23, 12]}, {}, "int_slice", "int_slice",
     [43, -23, 12]),
    ({"int_slice": "43, -23, 12"}, {}, "int_slice", "int_slice",
     [43, -23, 12]),
    ({"int_slice": "${TEST_INT_SLICE}"}, {}, "int_slice", "int_slice",
     C.MissingEnvVar),
    ({}, {}, "int_slice", "int_slice", []),
    ({"uint": "${TEST_UINT}"}, E, "uint", "uint", 1),
    ({"uint": 1}, {}, "uint", "uint", 1),
    ({"uint": "${TEST_UINT}"}, {}, "uint", "uint", C.MissingEnvVar),
    ({"uint_slice": "${TEST_UINT_SLICE}"}, ES, "uint_slice", "uint_slice",
     [123, 324]),
    ({"uint_slice": [43, 23, 12]}, {}, "uint_slice", "uint_slice",
     [43, 23, 12]),
    ({"uint_slice": "43, 23, 12"}, {}, "uint_slice", "uint_slice",
     [43, 23, 12]),
    ({"uint_slice": "${TEST_UINT_SLICE}"}, {}, "uint_slice", "uint_slice",
     C.MissingEnvVar),
    ({}, {}, "uint_slice", "uint_slice", []),
    ({"float": "${TEST_FLOAT}"}, E, "float", "float", 1.0),
    ({"float": 1.0}, {}, "float", "float", 1.0),
    ({"float": "${TEST_FLOAT}"}, {}, "float", "float", C.MissingEnvVar),
    ({"float_slice": "${TEST_FLOAT_SLICE}"}, ES, "float_slice",
     "float_slice", [123.0, 324.0]),
    ({"float_slice": [43.0, 23.0, 12.0]}, {}, "float_slice", "float_slice",
     [43.0, 23.0, 12.0]),
    ({"float_slice": "43.0, 23.0, 12.0"}, {}, "float_slice", "float_slice",
     [43.0, 23.0, 12.0]),
    ({"float_slice": "${TEST_FLOAT_SLICE}"}, {}, "float_slice",
     "float_slice", C.MissingEnvVar),
    ({}, {}, "float_slice", "float_slice", []),
    # iface passthrough cases
    ({"interface": "hello"}, {}, "string", "interface", "hello"),
    ({"interface": True}, {}, "bool", "interface", True),
    ({"interface": -25}, {}, "int", "interface", -25),
    ({"interface": 42}, {}, "uint", "interface", 42),
    ({"interface": -25e-10}, {}, "float", "interface", -25e-10),
    ({"interface_slice": ["hello", "world"]}, {}, "string_slice",
     "interface_slice", ["hello", "world"]),
    ({"interface_slice": [True, False, False]}, {}, "bool_slice",
     "interface_slice", [True, False, False]),
    ({"interface_slice": [42, -25, 1970]}, {}, "int_slice",
     "interface_slice", [42, -25, 1970]),
    ({"interface_slice": [42, 25, 1970]}, {}, "uint_slice",
     "interface_slice", [42, 25, 1970]),
    ({"interface_slice": [42.0, -25e-10, 1.970e4]}, {}, "float_slice",
     "interface_slice", [42.0, -25e-10, 1.970e4]),
]


@pytest.mark.parametrize("d,env,accessor,key,expected", CASES)
def test_env_dict_table(d, env, accessor, key, expected):
    ed = C.EnvDict(d, env=env)
    fn = getattr(ed, accessor)
    if isinstance(expected, type) and issubclass(expected, Exception):
        with pytest.raises(expected):
            fn(key)
    else:
        got = fn(key)
        assert got == expected
        # slices come back as the right element types
        if isinstance(expected, list) and expected:
            assert type(got[0]) is type(expected[0])


def test_uint_rejects_negative():
    ed = C.EnvDict({"u": -3, "us": [1, -2]})
    with pytest.raises(C.ConfigTypeError):
        ed.uint("u")
    with pytest.raises(C.ConfigTypeError):
        ed.uint_slice("us")


def test_scalar_missing_key_default():
    ed = C.EnvDict({})
    assert ed.string("nope", "dflt") == "dflt"
    with pytest.raises(KeyError):
        ed.int("nope")


def test_nil_value_behaves_like_missing_key():
    """internal/env Dict treats a key present with nil like a missing
    key: default returned when given, ErrKeyRequired otherwise, empty
    slice for slice accessors (round-3 ADVICE finding)."""
    ed = C.EnvDict({"k": None, "s": None})
    assert ed.string("k", "dflt") == "dflt"
    assert ed.int("k", 7) == 7
    with pytest.raises(KeyError):
        ed.string("k")
    assert ed.string_slice("s") == []
