"""CHEMKIN-II mechanism reader.

Reference: src/thermophysicalModels/reactionThermo/chemistryReaders/
chemkinReader/ (a flex/bison lexer in the reference; re-founded here as
a plain-text parser producing the same model objects the foam-format
reader does: species names, janaf SpecieThermo stacks and Arrhenius
Reaction tuples in SI/kmol units).

Supported surface:
- ELEMENTS / SPECIES / THERMO (NASA-7 cards, inline or separate file)
  / REACTIONS blocks, case-insensitive keywords, `!` comments;
- reaction lines `A+B=C+D  A beta Ea` with `=`/`<=>` (reversible) and
  `=>` (irreversible), integer/real stoichiometry;
- third-body `+M` reactions with per-species efficiency lines
  (`H2O/6.0/ ...`);
- explicit reverse rates `REV /A beta Ea/` (emitted as a second
  irreversible reaction);
- `DUPLICATE` keyword (both rates kept and summed, as CHEMKIN does);
- unit keywords on the REACTIONS line: CAL/MOLE (default), KCAL/MOLE,
  JOULES/MOLE, KJOULES/MOLE, KELVINS; MOLES (default) concentrations.

Pressure-dependent falloff reactions ((+M), LOW/TROE/SRI) are rejected
with a clear error naming the reaction — same de-scope class as the
reference's unimplemented Landau-Teller forms.

Unit conversion: CHEMKIN pre-exponentials are in cm^3-mol-s; with
concentrations in kmol/m^3 (1 mol/cm^3 = 1e3 kmol/m^3) the forward
constant converts as A_SI = A_cgs * 1e-3^(order-1).
"""

from __future__ import annotations

import re

from .chemistry import Reaction
from .thermo import SpecieThermo

R_CAL = 1.98720425864083        # cal/mol/K

ATOMIC_WEIGHTS = {
    "H": 1.00794, "D": 2.0141, "T": 3.0160, "C": 12.011, "N": 14.0067,
    "O": 15.9994, "F": 18.9984, "NE": 20.1797, "NA": 22.9898,
    "MG": 24.305, "AL": 26.9815, "SI": 28.0855, "P": 30.9738,
    "S": 32.06, "CL": 35.453, "AR": 39.948, "K": 39.0983,
    "CA": 40.078, "FE": 55.845, "BR": 79.904, "I": 126.904,
    "HE": 4.0026, "KR": 83.798, "XE": 131.293,
}

_EA_UNITS = {
    "CAL/MOLE": 1.0 / R_CAL,
    "KCAL/MOLE": 1000.0 / R_CAL,
    "JOULES/MOLE": 1.0 / 8.314462618,
    "KJOULES/MOLE": 1000.0 / 8.314462618,
    "KELVINS": 1.0,
    "KELVINS": 1.0,
    "EVOLTS": 11604.5,
}


def _strip_comments(text: str) -> str:
    return "\n".join(ln.split("!", 1)[0] for ln in text.splitlines())


def _blocks(text: str):
    """Split into (keyword, body) blocks delimited by END."""
    toks = re.split(r"(?im)^\s*(ELEMENTS|ELEM|SPECIES|SPEC|THERMO"
                    r"(?:\s+ALL)?|REACTIONS|REAC)\b", text)
    out = []
    i = 1
    while i < len(toks) - 1:
        kw = toks[i].split()[0].upper()
        body = re.split(r"(?im)^\s*END\s*$", toks[i + 1])[0]
        out.append((kw, body, toks[i + 1]))
        i += 2
    return out


def parse_nasa7(body: str):
    """THERMO block -> {name: (composition, Tlow, Thigh, Tcommon,
    a_high(7), a_low(7))}. Fixed-column NASA-7 cards."""
    out = {}
    lines = [ln for ln in body.splitlines() if ln.strip()]
    # optional global temperature-range line
    i = 0
    if lines and re.match(r"^\s*[\d.]+\s+[\d.]+\s+[\d.]+\s*$", lines[0]):
        i = 1
    while i + 3 < len(lines) + 1:
        l1 = lines[i] if i < len(lines) else ""
        if not l1.rstrip().endswith("1"):
            i += 1
            continue
        if i + 3 >= len(lines) + 0 and len(lines) - i < 4:
            break
        l2, l3, l4 = lines[i + 1], lines[i + 2], lines[i + 3]
        name = l1[:18].split()[0].upper()
        comp = {}
        for j in range(4):
            seg = l1[24 + 5 * j:24 + 5 * (j + 1)]
            sym = seg[:2].strip().upper()
            try:
                cnt = float(seg[2:].strip() or 0)
            except ValueError:
                cnt = 0.0
            if sym and cnt:
                comp[sym] = comp.get(sym, 0.0) + cnt
        try:
            t_low = float(l1[45:55])
            t_high = float(l1[55:65])
            t_common = float(l1[65:73].strip() or 1000.0)
        except ValueError:
            t_low, t_high, t_common = 200.0, 5000.0, 1000.0

        def coeffs(line, n):
            return [float(line[15 * k:15 * (k + 1)]) for k in range(n)]
        a_high = coeffs(l2, 5) + coeffs(l3, 2)
        a_low = [float(l3[30 + 15 * k:30 + 15 * (k + 1)])
                 for k in range(3)] + coeffs(l4, 4)
        out[name] = (comp, t_low, t_high, t_common,
                     tuple(a_high), tuple(a_low))
        i += 4
    return out


def _mol_weight(comp: dict) -> float:
    w = 0.0
    for sym, cnt in comp.items():
        if sym not in ATOMIC_WEIGHTS:
            raise KeyError(f"chemkinReader: unknown element '{sym}'")
        w += ATOMIC_WEIGHTS[sym] * cnt
    return w


_RXN_RE = re.compile(
    r"^(?P<eqn>.+?)\s+(?P<A>[\d.eEdD+-]+)\s+(?P<beta>[\d.eEdD+-]+)"
    r"\s+(?P<Ea>[\d.eEdD+-]+)\s*$")


def _num(s):
    return float(s.replace("d", "e").replace("D", "E"))


def _side(text, index, name):
    """Parse one reaction side; returns (terms, has_third_body)."""
    text = text.strip()
    if "(+M)" in text.upper() or "(+ M)" in text.upper():
        raise NotImplementedError(
            f"chemkinReader: falloff reaction '{name}' ((+M)/LOW/TROE) "
            f"not supported — rewrite as high-pressure-limit +M or "
            f"plain Arrhenius")
    third = False
    terms = []
    for raw in re.split(r"\+", text):
        t = raw.strip()
        if not t:
            continue
        if t.upper() == "M":
            third = True
            continue
        m = re.match(r"^(\d*\.?\d*)\s*(.+)$", t)
        nu = float(m.group(1)) if m.group(1) else 1.0
        sp = m.group(2).strip().upper()
        if sp not in index:
            raise KeyError(f"chemkinReader: reaction '{name}' uses "
                           f"unknown specie '{sp}'")
        terms.append((index[sp], nu, nu))
    return tuple(terms), third


def parse_reactions_chemkin(body: str, species: list[str]):
    """REACTIONS block -> [Reaction] in SI/kmol units."""
    index = {s.upper(): i for i, s in enumerate(species)}
    lines = [ln.strip() for ln in body.splitlines() if ln.strip()]
    ea_fac = _EA_UNITS["CAL/MOLE"]
    if lines:
        for kw in lines[0].split() if not _RXN_RE.match(lines[0]) else ():
            kwu = kw.upper()
            if kwu in _EA_UNITS:
                ea_fac = _EA_UNITS[kwu]
            elif kwu in ("REACTIONS", "REAC", "MOLES"):
                pass  # block keyword / default concentration units
            else:
                # MOLECULES (A in molecules/cm3) or anything unrecognised
                # would silently corrupt every pre-exponential by an
                # Avogadro-scale factor — reject loudly instead.
                raise NotImplementedError(
                    f"chemkinReader: unsupported REACTIONS-line unit "
                    f"keyword '{kw}' (supported: "
                    f"{sorted(_EA_UNITS)} + MOLES)")
        if not _RXN_RE.match(lines[0]):
            lines = lines[1:]
    out = []
    last = None            # (lhs, rhs, third, effs) of previous rxn
    cur = []               # out-indices of the current fwd(+rev) pair —
    #                        CHEMKIN allows aux lines in any order, so an
    #                        efficiency line after REV must patch both
    for ln in lines:
        up = ln.upper()
        if up.startswith("DUPLICATE") or up.startswith("DUP"):
            continue
        if up.startswith("REV"):
            m = re.search(r"/(.+)/", ln)
            a, b, ea = (_num(x) for x in m.group(1).split())
            if last is None:
                raise ValueError("chemkinReader: REV before a reaction")
            lhs, rhs, third, order = last
            # mark the forward irreversible and emit explicit reverse
            fwd = out[-1]
            out[-1] = Reaction(fwd.lhs, fwd.rhs, fwd.A, fwd.beta,
                               fwd.Ta, reversible=False,
                               third_body=fwd.third_body,
                               efficiencies=fwd.efficiencies)
            rev_order = sum(nu for _, nu, _ in rhs) + (1 if third else 0)
            out.append(Reaction(
                rhs, lhs, a * 1e-3 ** (rev_order - 1), b, ea * ea_fac,
                reversible=False, third_body=third,
                efficiencies=fwd.efficiencies))
            cur.append(len(out) - 1)
            continue
        if "/" in ln and "=" not in ln:
            # third-body efficiency line: "H2O/6.0/ CO2/2.0/"
            if not cur:
                raise ValueError(
                    "chemkinReader: third-body efficiency line before "
                    f"any reaction: '{ln}'")
            effs = dict(out[cur[0]].efficiencies or ())
            for m in re.finditer(r"([A-Za-z][\w()*-]*)\s*/\s*"
                                 r"([\d.eEdD+-]+)\s*/", ln):
                sp = m.group(1).upper()
                if sp in index:
                    effs[index[sp]] = _num(m.group(2))
            for i in cur:       # patch forward AND explicit reverse
                r = out[i]
                out[i] = Reaction(r.lhs, r.rhs, r.A, r.beta, r.Ta,
                                  reversible=r.reversible,
                                  third_body=r.third_body,
                                  efficiencies=tuple(sorted(effs.items())))
            continue
        m = _RXN_RE.match(ln)
        if not m:
            continue
        eqn = m.group("eqn").strip()
        reversible = "=>" not in eqn or "<=>" in eqn
        parts = re.split(r"<=>|=>|=", eqn)
        lhs, third_l = _side(parts[0], index, eqn)
        rhs, third_r = _side(parts[-1], index, eqn)
        third = third_l or third_r
        order = sum(nu for _, nu, _ in lhs) + (1 if third else 0)
        a = _num(m.group("A")) * 1e-3 ** (order - 1)
        out.append(Reaction(
            lhs, rhs, a, _num(m.group("beta")),
            _num(m.group("Ea")) * ea_fac, reversible=reversible,
            third_body=third, efficiencies=()))
        last = (lhs, rhs, third, order)
        cur = [len(out) - 1]
    return out


def read_chemkin(mech_path: str, thermo_path: str | None = None,
                 transport: dict | None = None):
    """Read a CHEMKIN mechanism (+ optional separate THERMO file).
    Returns (species, specs, reactions) matching the foam-format
    reader's contract (chemistry.read_reacting_thermo)."""
    text = _strip_comments(open(mech_path).read())
    species: list[str] = []
    thermo_data = {}
    reactions_body = None
    for kw, body, _ in _blocks(text):
        if kw in ("SPECIES", "SPEC"):
            species += [s.upper() for s in body.split()]
        elif kw.startswith("THERMO"):
            thermo_data.update(parse_nasa7(body))
        elif kw in ("REACTIONS", "REAC"):
            reactions_body = body
    if thermo_path:
        tt = _strip_comments(open(thermo_path).read())
        m = re.search(r"(?is)THERMO(?:\s+ALL)?(.*?)(?:^\s*END|\Z)", tt,
                      re.M)
        thermo_data.update(parse_nasa7(m.group(1) if m else tt))
    if not species:
        raise ValueError("chemkinReader: no SPECIES block")

    specs = []
    for name in species:
        if name not in thermo_data:
            raise KeyError(f"chemkinReader: no THERMO data for "
                           f"'{name}'")
        comp, t_lo, t_hi, t_c, a_hi, a_lo = thermo_data[name]
        specs.append(SpecieThermo(
            mol_weight=_mol_weight(comp), energy="sensibleEnthalpy",
            cp_mode="janaf", janaf_low=a_lo, janaf_high=a_hi,
            t_low=t_lo, t_high=t_hi, t_common=t_c,
            transport="sutherland",
            as_=(transport or {}).get("As", 1.67212e-06),
            ts=(transport or {}).get("Ts", 170.672)))
    reactions = parse_reactions_chemkin(reactions_body or "", species)
    return species, specs, reactions
