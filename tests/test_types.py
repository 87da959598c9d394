"""Type system: resolve / detect / typecheck (SURVEY.md §2.1 R1-R11)."""

import pyspark.sql.types as st
import pytest

import bertrand_spark as b


class TestResolve:
    def test_basic_aliases(self):
        assert b.resolve("int32").name == "int32"
        assert b.resolve("i4") is b.resolve("int32")
        assert b.resolve("double") is b.resolve("float64")
        assert b.resolve("bool").name == "bool"

    def test_python_classes(self):
        assert b.resolve(int) is b.resolve("int64")
        assert b.resolve(float) is b.resolve("float64")
        assert b.resolve(str) is b.resolve("string")

    def test_spark_dtypes(self):
        assert b.resolve(st.LongType()) is b.resolve("int64")
        assert b.resolve(st.DoubleType()) is b.resolve("float64")

    def test_union(self):
        u = b.resolve("int | float64")
        assert len(u) == 2
        assert b.resolve("int32") in u

    def test_structured(self):
        s = b.resolve("foo: int32, bar: bool")
        assert set(s.keys()) == {"foo", "bar"}
        assert s["foo"] is b.resolve("int32")

    def test_parametrized_flyweight(self):
        a = b.resolve("decimal[20, 4]")
        c = b.resolve("decimal[20, 4]")
        assert a is c
        assert a.params == (20, 4)

    def test_decorator(self):
        s = b.resolve("sparse[int, 23]")
        assert s.decorator == "sparse"
        assert s.wrapped is b.resolve("int")
        assert s.params == (23,)
        cat = b.resolve("categorical[string]")
        assert cat.decorator == "categorical"

    def test_sized_unicode(self):
        t = b.resolve("U32")
        assert t.unparametrized is b.resolve("string")
        assert t.params == (32,)

    def test_backend_selector_collapses(self):
        assert b.resolve("int64[pandas]") is b.resolve("int64")

    def test_bad_spec(self):
        with pytest.raises(ValueError):
            b.resolve("not_a_type_xyz")

    def test_mapping(self):
        s = b.resolve({"a": "int8", "b": float})
        assert s["a"] is b.resolve("int8")


class TestLattice:
    def test_hierarchy(self):
        i32 = b.resolve("int32")
        assert i32.root is b.resolve("int")
        assert i32.parent.name == "signed"
        assert b.resolve("int").contains(i32)
        assert not i32.contains(b.resolve("int"))

    def test_larger_smaller(self):
        assert b.resolve("int16") in b.resolve("int8").larger
        assert b.resolve("int8") in b.resolve("int64").smaller

    def test_bounds(self):
        assert b.resolve("int8").max == 127
        assert b.resolve("int8").min == -128
        assert b.resolve("uint64").max == 2**64 - 1

    def test_default_links(self):
        assert b.resolve("int").as_default() is b.resolve("int64")
        assert b.resolve("float").as_default() is b.resolve("float64")

    def test_union_algebra(self):
        u = b.resolve("int8 | int16")
        v = b.resolve("int16 | int32")
        assert (u & v) == b.UnionType([b.resolve("int16")])
        assert b.resolve("int8") in (u | v)
        assert (u - v) == b.UnionType([b.resolve("int8")])
        assert u.issubset(b.resolve("int"))
        assert not u.isdisjoint(v)

    def test_union_sorted_by_features(self):
        u = b.resolve("int64 | int8 | int16").sorted()
        assert [t.name for t in u] == ["int8", "int16", "int64"]


class TestDetect:
    def test_dataframe_schema_o1(self, spark, lineitem):
        s = b.detect(lineitem)
        assert isinstance(s, b.StructuredType)
        assert s["l_orderkey"] is b.resolve("int64")
        assert s["l_quantity"] is b.resolve("float64")
        assert s["l_returnflag"] is b.resolve("string")

    def test_scalars(self):
        assert b.detect(1) is b.resolve("int64")
        assert b.detect(1.5) is b.resolve("float64")
        assert b.detect("x") is b.resolve("string")
        assert b.detect(True) is b.resolve("bool")
        assert b.detect(None) is b.resolve("missing")

    def test_sequence_union_first_seen(self):
        u = b.detect([1, 2.5, "x"])
        assert [t.name for t in u] == ["int64", "float64", "string"]

    def test_elementwise_distributed(self, spark):
        df = spark.createDataFrame(
            [("1",), ("2.5",), ("true",), ("hello",), (None,)], ["v"]
        )
        u = b.detect_elementwise(df, "v")
        names = [t.name for t in u]
        assert set(names) == {"int64", "float64", "bool", "string"}
        # first-seen order
        assert names[0] == "int64"


class TestTypecheck:
    def test_df_schema_check(self, lineitem):
        assert b.typecheck(lineitem, {"l_orderkey": "int64", "l_quantity": "float64"})
        assert b.typecheck(lineitem, {"l_orderkey": "int"})  # hierarchy
        assert not b.typecheck(lineitem, {"l_orderkey": "int8"})
        assert not b.typecheck(lineitem, {"l_orderkey": "string"})

    def test_scalar_check(self):
        assert b.typecheck(1, "int")
        assert b.typecheck([1, 2], "int")
        assert not b.typecheck([1, "x"], "int")
        assert b.typecheck([1, "x"], "int | string")
