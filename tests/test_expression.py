"""Expression IR: constant folding (`simplified`, reference
util/expression.rs:326-486 semantics) and structural helpers."""

from halo2_lasso_tpu.expression import Expression, evaluate_host

P = 0x30644E72E131A029B85045B68181585D2833E84879B9709143E1F593F0000001


def _eval(e, polys):
    def leaf(kind, arg):
        assert kind == "poly"
        return polys[arg.poly]

    return evaluate_host(e, P, leaf, [])


def test_simplified_preserves_value():
    x, y = Expression.poly(0), Expression.poly(1)
    e = (
        (x * 0 + y * 1) * Expression.constant(3)
        + (Expression.constant(2) + Expression.constant(5)) * x
        - (-(-y))
    ) * Expression.constant(1)
    s = e.simplified(P)
    vals = {0: 123456, 1: 789012}
    assert _eval(e, vals) == _eval(s, vals)


def test_simplified_folds_constants():
    # pure-constant trees collapse to one constant node
    e = (Expression.constant(3) * 4 + Expression.constant(5)) * Expression.constant(2)
    s = e.simplified(P)
    assert s.kind == "const" and s.args[0] == 34

    # 0 * x collapses entirely
    z = (Expression.constant(0) * Expression.poly(0)).simplified(P)
    assert z.kind == "const" and z.args[0] == 0

    # 1 * x drops the multiplication
    one_x = (Expression.constant(1) * Expression.poly(0)).simplified(P)
    assert one_x.kind == "poly"


def test_simplified_shrinks_mul_count():
    x = Expression.poly(0)
    e = x * Expression.constant(1) * Expression.constant(1) + x * 0
    assert e.simplified(P).mul_count <= e.mul_count
