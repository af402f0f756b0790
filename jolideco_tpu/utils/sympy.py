"""Symbolic helper used in prior docstrings (reference
``jolideco/utils/sympy.py``): expand the log of a symbolic product into
an explicit sum, so the closed-form log-priors documented on
`InverseGammaPrior`/`ExponentialPrior` can be re-derived.
"""

__all__ = ["concrete_expand_log"]


def concrete_expand_log(expr, first_call=True):
    """Expand ``log(Product(...))`` into ``Sum(log(...))`` explicitly.

    Parameters
    ----------
    expr : sympy expression
    first_call : bool
        Apply ``expand_log`` once at the top level.
    """
    import sympy as sp

    if first_call:
        expr = sp.expand_log(expr, force=True)

    func = expr.func
    args = expr.args

    if args == ():
        return expr

    if func == sp.log and args[0].func == sp.concrete.products.Product:
        prod = args[0]
        term = prod.args[0]
        indices = prod.args[1:]
        return sp.Sum(sp.log(term), *indices)

    return func(*(concrete_expand_log(arg, False) for arg in args))
