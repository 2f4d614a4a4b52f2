"""Minimal symbolic unit algebra (astropy is not available in this image).

Reproduces the reference's unit semantics (parity targets:
/root/reference/python/opencosmo/units/convention.py:7-11,
/root/reference/python/opencosmo/units/converters.py:23-210):

* a unit is a product of base symbols with rational exponents
  (``Msun * Mpc**-1 * h**-1`` etc.), parsed from strings like
  ``"Msun/h"``, ``"km/s"``, ``"(km/s)^2"``, ``"comoving Mpc/h"``;
* four conventions: ``scalefree`` (littleh factors kept), ``comoving``
  (littleh removed: value * h**p, p = h-exponent), ``physical``
  (comoving value * a**d, d = length-dimension power), ``unitless``;
* log-units: ``dex(<base>)`` wraps the physical base unit of a log10.

All convention math happens driver-side as symbolic rewrites; the data
only ever sees ``col * lit(scalar)`` or ``col * pow(a_col, d)``
projections, which Catalyst constant-folds.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from fractions import Fraction

__all__ = [
    "Unit",
    "Quantity",
    "UnitConvention",
    "parse_unit",
    "UnitError",
    "KNOWN_SCALEFACTOR_COLUMNS",
    "KNOWN_REDSHIFT_COLUMNS",
]

# mirrors reference converters.py:18-19
KNOWN_SCALEFACTOR_COLUMNS = {"fof_halo_center_a"}
KNOWN_REDSHIFT_COLUMNS = {"redshift", "redshift_true"}


class UnitConvention:
    COMOVING = "comoving"
    PHYSICAL = "physical"
    SCALEFREE = "scalefree"
    UNITLESS = "unitless"
    ALL = (COMOVING, PHYSICAL, SCALEFREE, UNITLESS)


class UnitError(ValueError):
    pass


# base symbol -> (dimension, scale_to_SI_of_that_dimension)
# dimensions: L length, M mass, T time, A angle, 1 dimensionless
_BASES: dict[str, tuple[str, float]] = {
    "m": ("L", 1.0),
    "cm": ("L", 1e-2),
    "km": ("L", 1e3),
    "pc": ("L", 3.0856775814913673e16),
    "kpc": ("L", 3.0856775814913673e19),
    "Mpc": ("L", 3.0856775814913673e22),
    "lyr": ("L", 9.460730472580800e15),
    "kg": ("M", 1.0),
    "g": ("M", 1e-3),
    "Msun": ("M", 1.98892e30),
    "s": ("T", 1.0),
    "yr": ("T", 3.15576e7),
    "Myr": ("T", 3.15576e13),
    "Gyr": ("T", 3.15576e16),
    "rad": ("A", 1.0),
    "deg": ("A", 0.017453292519943295),
    "h": ("1", 1.0),  # littleh — handled specially by conventions
    "K": ("K", 1.0),
}


@dataclass(frozen=True)
class Unit:
    """Immutable product of base symbols with rational exponents."""

    powers: tuple[tuple[str, Fraction], ...] = ()
    # dex(<base>) marker for log10-derived columns
    is_dex: bool = False

    # -- constructors -------------------------------------------------
    @staticmethod
    def dimensionless() -> "Unit":
        return Unit()

    @staticmethod
    def of(**exps: int | Fraction) -> "Unit":
        return Unit(_norm({k: Fraction(v) for k, v in exps.items()}))

    def as_dict(self) -> dict[str, Fraction]:
        return dict(self.powers)

    # -- algebra ------------------------------------------------------
    def __mul__(self, other: "Unit") -> "Unit":
        if self.is_dex or other.is_dex:
            raise UnitError("cannot multiply dex units")
        d = self.as_dict()
        for k, v in other.powers:
            d[k] = d.get(k, Fraction(0)) + v
        return Unit(_norm(d))

    def __truediv__(self, other: "Unit") -> "Unit":
        return self * other.pow(-1)

    def pow(self, p: int | float | Fraction) -> "Unit":
        if self.is_dex:
            raise UnitError("cannot exponentiate dex units")
        frac = Fraction(p).limit_denominator(1000)
        return Unit(_norm({k: v * frac for k, v in self.powers}))

    def sqrt(self) -> "Unit":
        return self.pow(Fraction(1, 2))

    def dex(self) -> "Unit":
        return Unit(self.powers, is_dex=True)

    def undex(self) -> "Unit":
        return Unit(self.powers, is_dex=False)

    # -- properties ---------------------------------------------------
    @property
    def dimensionless_(self) -> bool:
        return not self.powers

    @property
    def h_power(self) -> Fraction:
        return self.as_dict().get("h", Fraction(0))

    @property
    def length_power(self) -> Fraction:
        """Exponent of the length dimension (reference
        converters.py:115-123 ``get_unit_distance_power``)."""
        total = Fraction(0)
        for sym, p in self.powers:
            if _BASES.get(sym, ("?", 0))[0] == "L":
                total += p
        return total

    def dimension(self) -> dict[str, Fraction]:
        dims: dict[str, Fraction] = {}
        for sym, p in self.powers:
            d = _BASES.get(sym, ("?", 0.0))[0]
            if d != "1":
                dims[d] = dims.get(d, Fraction(0)) + p
        return {k: v for k, v in dims.items() if v != 0}

    def si_factor(self) -> float:
        f = 1.0
        for sym, p in self.powers:
            f *= _BASES.get(sym, ("?", 1.0))[1] ** float(p)
        return f

    def conversion_factor(self, other: "Unit") -> float:
        """Multiplier converting values in ``self`` to ``other``.

        Units that differ in littleh power are DIFFERENT conventions,
        not a numeric conversion — the factor depends on the cosmology,
        which plain unit algebra doesn't have. The reference routes
        those through ``cu.with_H0`` or errors; silently treating h as
        1 would mix conventions, so we raise (convert via
        ``Dataset.with_units`` instead, which has the cosmology).
        """
        a, b = self.as_dict(), other.as_dict()
        if a.pop("h", 0) != b.pop("h", 0):
            raise UnitError(
                f"{self} -> {other} changes littleh power: that is a "
                "unit-convention switch (needs the cosmology); use "
                "Dataset.with_units instead of unit arithmetic"
            )
        ua, ub = Unit(_norm(a)), Unit(_norm(b))
        if ua.dimension() != ub.dimension():
            raise UnitError(f"incompatible units: {self} -> {other}")
        return ua.si_factor() / ub.si_factor()

    def without_h(self) -> "Unit":
        d = self.as_dict()
        d.pop("h", None)
        return Unit(_norm(d), is_dex=self.is_dex)

    # -- formatting ---------------------------------------------------
    def __str__(self) -> str:
        if not self.powers:
            return "dex" if self.is_dex else ""
        num, den = [], []
        for sym, p in self.powers:
            tgt = num if p > 0 else den
            q = abs(p)
            if q == 1:
                tgt.append(sym)
            elif q.denominator == 1:
                tgt.append(f"{sym}^{q}")
            else:
                # fractional exponent needs parens: Mpc^1/2 would
                # parse as (Mpc^1)/2
                tgt.append(f"{sym}^({q})")
        s = " ".join(num) if num else "1"
        if den:
            # parenthesize multi-factor denominators: "1 / Mpc Msun"
            # would parse as (1/Mpc)*Msun under standard precedence
            d = " ".join(den)
            s += " / " + (f"({d})" if len(den) > 1 else d)
        return f"dex({s})" if self.is_dex else s

    def __repr__(self) -> str:  # pragma: no cover
        return f"Unit({self})"


def _norm(d: dict[str, Fraction]) -> tuple[tuple[str, Fraction], ...]:
    return tuple(sorted((k, v) for k, v in d.items() if v != 0))


# ---------------------------------------------------------------------
# parser: "Msun/h", "km/s", "(km/s)^2", "Mpc", "comoving Mpc/h", "dex(Msun)"
# ---------------------------------------------------------------------
def parse_unit(text: str | None) -> Unit:
    if text is None:
        return Unit()
    s = text.strip()
    if not s or s in ("-", "none", "None", "dimensionless", "unitless", "1"):
        return Unit()
    # leading convention adjectives appear in some reference headers
    for adj in ("comoving", "physical"):
        if s.startswith(adj + " "):
            s = s[len(adj) + 1 :]
    if s.startswith("dex(") and s.endswith(")"):
        return parse_unit(s[4:-1]).dex()
    try:
        return _Parser(s).parse()
    except UnitError:
        raise
    except Exception as exc:  # noqa: BLE001 - surface as UnitError
        raise UnitError(f"cannot parse unit {text!r}: {exc}") from exc


class _Parser:
    """Tiny recursive-descent parser for unit expressions."""

    def __init__(self, s: str):
        self.toks = self._lex(s)
        self.i = 0

    @staticmethod
    def _lex(s: str) -> list[str]:
        out: list[str] = []
        i = 0
        while i < len(s):
            c = s[i]
            if c.isspace():
                # whitespace between factors means multiplication
                out.append("*")
                i += 1
            elif c in "()*/":
                if c == "*" and i + 1 < len(s) and s[i + 1] == "*":
                    out.append("^")
                    i += 2
                else:
                    out.append(c)
                    i += 1
            elif c == "^":
                out.append("^")
                i += 1
            elif c.isalnum() or c in "+-._":
                j = i
                while j < len(s) and (s[j].isalnum() or s[j] in "+-._"):
                    j += 1
                out.append(s[i:j])
                i = j
            else:
                raise UnitError(f"bad char {c!r}")
        # collapse whitespace-multiplication artifacts: drop a '*' that
        # would sit next to another operator or a paren
        res: list[str] = []
        for t in out:
            if t == "*" and (not res or res[-1] in "*/(^"):
                continue
            if t in "*/^)" and res and res[-1] == "*":
                res.pop()
            res.append(t)
        while res and res[-1] == "*":
            res.pop()
        return res

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse(self) -> Unit:
        u = self.term()
        while self.peek() in ("*", "/"):
            op = self.next()
            rhs = self.term()
            u = u * rhs if op == "*" else u / rhs
        if self.peek() is not None:
            raise UnitError(f"trailing tokens at {self.toks[self.i:]}")
        return u

    def term(self) -> Unit:
        t = self.peek()
        if t == "(":
            self.next()
            u = self.parse_group()
        else:
            name = self.next()
            if name.replace(".", "").replace("-", "").replace("+", "").isdigit():
                u = Unit()  # numeric factor: ignore scale (e.g. "1")
            elif name in _BASES:
                u = Unit.of(**{name: 1})
            else:
                raise UnitError(f"unknown unit symbol {name!r}")
        if self.peek() == "^":
            self.next()
            exp = self.next()
            if exp == "(":
                frac = Fraction(self.next())
                if self.peek() == "/":
                    self.next()
                    frac /= Fraction(self.next())
                if self.next() != ")":
                    raise UnitError("unbalanced parens in exponent")
                u = u.pow(frac)
            else:
                u = u.pow(Fraction(exp))
        return u

    def parse_group(self) -> Unit:
        u = self.term()
        while self.peek() in ("*", "/"):
            op = self.next()
            rhs = self.term()
            u = u * rhs if op == "*" else u / rhs
        if self.next() != ")":
            raise UnitError("unbalanced parens")
        return u


@dataclass(frozen=True)
class Quantity:
    """Minimal stand-in for ``astropy.units.Quantity`` in predicates:
    ``ds.filter(col("fof_halo_mass") > Quantity(1e13, "Msun/h"))``.
    """

    value: float
    unit: Unit = field(default_factory=Unit)

    def __post_init__(self):
        if isinstance(self.unit, str):
            object.__setattr__(self, "unit", parse_unit(self.unit))

    def to_value(self, target: Unit) -> float:
        return self.value * self.unit.conversion_factor(target)
