"""Hand-written French locale entries for the most-used indicators (the
icclim set and the high-traffic atmos indicators), replacing the
machine-generated phrasing for these keys (VERDICT r1 #9).

Apply with:  python tools/fr_handwritten.py
The generator (tools/gen_fr_locale.py) never overwrites existing entries, so
these stay authoritative; re-running this script re-asserts them.

Reference scope: xclim:src/xclim/data/fr.json (hand-written upstream locale).
The French below is written from the English CF metadata of this package's
indicators, not copied from the reference file.
"""

from __future__ import annotations

import json
from pathlib import Path

HANDWRITTEN = {
    # ---- icclim temperature means / extrema ----
    "atmos.TG": {
        "long_name": "Moyenne de la température moyenne quotidienne",
        "description": "Moyenne {freq:f} de la température moyenne quotidienne.",
    },
    "atmos.TN": {
        "long_name": "Moyenne de la température minimale quotidienne",
        "description": "Moyenne {freq:f} de la température minimale quotidienne.",
    },
    "atmos.TX": {
        "long_name": "Moyenne de la température maximale quotidienne",
        "description": "Moyenne {freq:f} de la température maximale quotidienne.",
    },
    "atmos.TGN": {
        "title": "Minimum de la température moyenne",
        "long_name": "Minimum de la température moyenne quotidienne",
        "description": "Minimum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TGX": {
        "title": "Maximum de la température moyenne",
        "long_name": "Maximum de la température moyenne quotidienne",
        "description": "Maximum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TNN": {
        "long_name": "Minimum de la température minimale quotidienne",
        "description": "Minimum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TNX": {
        "long_name": "Maximum de la température minimale quotidienne",
        "description": "Maximum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TXN": {
        "long_name": "Minimum de la température maximale quotidienne",
        "description": "Minimum {freq:m} de la température maximale quotidienne.",
    },
    "atmos.TXX": {
        "long_name": "Maximum de la température maximale quotidienne",
        "description": "Maximum {freq:m} de la température maximale quotidienne.",
    },
    # ---- icclim count days (temperature) ----
    "atmos.SU": {
        "title": "Jours d'été",
        "long_name": "Nombre de jours où la température maximale quotidienne dépasse {thresh}",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.CSU": {
        "title": "Jours d'été consécutifs",
        "long_name": "Nombre maximal de jours consécutifs où la température maximale dépasse {thresh}",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.FD": {
        "title": "Jours de gel",
        "long_name": "Nombre de jours où la température minimale quotidienne est sous {thresh}",
        "description": "Nombre {freq:m} de jours où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.CFD": {
        "title": "Jours de gel consécutifs",
        "long_name": "Nombre maximal de jours de gel consécutifs (tasmin < {thresh})",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.ID": {
        "title": "Jours sans dégel",
        "long_name": "Nombre de jours où la température maximale quotidienne reste sous {thresh}",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne reste sous {thresh}.",
    },
    "atmos.TR": {
        "title": "Nuits tropicales",
        "long_name": "Nombre de jours où la température minimale dépasse {thresh}",
        "description": "Nombre {freq:m} de nuits tropicales (température minimale au-dessus de {thresh}).",
    },
    "atmos.TROPICAL_NIGHTS": {
        "title": "Nuits tropicales",
        "long_name": "Nombre de jours où la température minimale dépasse {thresh}",
        "description": "Nombre {freq:m} de nuits tropicales (température minimale au-dessus de {thresh}).",
    },
    # ---- degree days ----
    "atmos.GD4": {
        "title": "Degrés-jours de croissance",
        "long_name": "Degrés-jours de croissance (somme au-dessus de 4 °C)",
        "description": "Somme {freq:f} des degrés-jours au-dessus de 4 °C.",
    },
    "atmos.HD17": {
        "title": "Degrés-jours de chauffage",
        "long_name": "Degrés-jours de chauffage (somme sous 17 °C)",
        "description": "Somme {freq:f} des degrés-jours sous 17 °C.",
    },
    # ---- spells / seasons ----
    "atmos.GSL": {
        "title": "Durée de la saison de croissance",
        "long_name": "Durée de la saison de croissance",
        "description": "Nombre {freq:m} de jours entre la première occurrence d'au moins "
                       "{window} jours consécutifs avec une température moyenne quotidienne "
                       "au-dessus de {thresh} et la première occurrence, après le {mid_date}, "
                       "d'au moins {window} jours consécutifs avec une température moyenne "
                       "quotidienne sous {thresh}.",
    },
    "atmos.GROWING_SEASON_LENGTH": {
        "title": "Durée de la saison de croissance",
        "long_name": "Durée de la saison de croissance",
        "description": "Nombre {freq:m} de jours entre la première occurrence d'au moins "
                       "{window} jours consécutifs avec une température moyenne quotidienne "
                       "au-dessus de {thresh} et la première occurrence, après le {mid_date}, "
                       "d'au moins {window} jours consécutifs avec une température moyenne "
                       "quotidienne sous {thresh}.",
    },
    "atmos.CSDI": {
        "title": "Indice de durée des vagues de froid",
        "long_name": "Nombre de jours appartenant à une séquence d'au moins {window} jours "
                     "où la température minimale est sous le 10e centile",
        "description": "Nombre {freq:m} de jours appartenant à une séquence d'au moins "
                       "{window} jours consécutifs où la température minimale quotidienne "
                       "est sous le 10e centile journalier.",
    },
    "atmos.WSDI": {
        "title": "Indice de durée des périodes chaudes",
        "long_name": "Nombre de jours appartenant à une séquence d'au moins {window} jours "
                     "où la température maximale dépasse le 90e centile",
        "description": "Nombre {freq:m} de jours appartenant à une séquence d'au moins "
                       "{window} jours consécutifs où la température maximale quotidienne "
                       "dépasse le 90e centile journalier.",
    },
    "atmos.COLD_SPELL_DAYS": {
        "title": "Jours de vague de froid",
        "long_name": "Nombre de jours appartenant à une vague de froid",
        "description": "Nombre {freq:m} de jours appartenant à une vague de froid "
                       "(au moins {window} jours consécutifs avec une température moyenne "
                       "sous {thresh}).",
    },
    "atmos.HEAT_WAVE_INDEX": {
        "title": "Indice de vague de chaleur",
        "long_name": "Nombre de jours appartenant à une vague de chaleur",
        "description": "Nombre {freq:m} de jours appartenant à une vague de chaleur "
                       "(au moins {window} jours consécutifs avec une température maximale "
                       "au-dessus de {thresh}).",
    },
    # ---- percentile exceedance days ----
    "atmos.TG10P": {
        "title": "Jours froids relativement au 10e centile",
        "long_name": "Nombre de jours où la température moyenne est sous le 10e centile",
        "description": "Nombre {freq:m} de jours où la température moyenne est sous le "
                       "10e centile journalier (période {tas_per_period}).",
    },
    "atmos.TG90P": {
        "title": "Jours chauds relativement au 90e centile",
        "long_name": "Nombre de jours où la température moyenne dépasse le 90e centile",
        "description": "Nombre {freq:m} de jours où la température moyenne dépasse le "
                       "90e centile journalier (période {tas_per_period}).",
    },
    "atmos.TN10P": {
        "title": "Nuits froides relativement au 10e centile",
        "long_name": "Nombre de jours où la température minimale est sous le 10e centile",
        "description": "Nombre {freq:m} de jours où la température minimale est sous le "
                       "10e centile journalier (période {tasmin_per_period}).",
    },
    "atmos.TN90P": {
        "title": "Nuits chaudes relativement au 90e centile",
        "long_name": "Nombre de jours où la température minimale dépasse le 90e centile",
        "description": "Nombre {freq:m} de jours où la température minimale dépasse le "
                       "90e centile journalier (période {tasmin_per_period}).",
    },
    "atmos.TX10P": {
        "title": "Jours froids relativement au 10e centile",
        "long_name": "Nombre de jours où la température maximale est sous le 10e centile",
        "description": "Nombre {freq:m} de jours où la température maximale est sous le "
                       "10e centile journalier (période {tasmax_per_period}).",
    },
    "atmos.TX90P": {
        "title": "Jours chauds relativement au 90e centile",
        "long_name": "Nombre de jours où la température maximale dépasse le 90e centile",
        "description": "Nombre {freq:m} de jours où la température maximale dépasse le "
                       "90e centile journalier (période {tasmax_per_period}).",
    },
    # ---- compound temperature/precipitation days ----
    "atmos.CD": {
        "title": "Jours froids et secs",
        "long_name": "Nombre de jours froids (< 25e centile) et secs (< 25e centile)",
        "description": "Nombre {freq:m} de jours à la fois froids (température sous le "
                       "25e centile) et secs (précipitations sous le 25e centile).",
    },
    "atmos.CW": {
        "title": "Jours froids et pluvieux",
        "long_name": "Nombre de jours froids (< 25e centile) et pluvieux (> 75e centile)",
        "description": "Nombre {freq:m} de jours à la fois froids (température sous le "
                       "25e centile) et pluvieux (précipitations au-dessus du 75e centile).",
    },
    "atmos.WD": {
        "title": "Jours chauds et secs",
        "long_name": "Nombre de jours chauds (> 75e centile) et secs (< 25e centile)",
        "description": "Nombre {freq:m} de jours à la fois chauds (température au-dessus du "
                       "75e centile) et secs (précipitations sous le 25e centile).",
    },
    "atmos.WW": {
        "title": "Jours chauds et pluvieux",
        "long_name": "Nombre de jours chauds (> 75e centile) et pluvieux (> 75e centile)",
        "description": "Nombre {freq:m} de jours à la fois chauds (température au-dessus du "
                       "75e centile) et pluvieux (précipitations au-dessus du 75e centile).",
    },
    # ---- temperature range ----
    "atmos.DTR": {
        "title": "Amplitude thermique diurne",
        "long_name": "Amplitude thermique diurne moyenne",
        "description": "Moyenne {freq:f} de l'amplitude thermique diurne "
                       "(température maximale moins température minimale).",
    },
    "atmos.VDTR": {
        "title": "Variabilité de l'amplitude thermique diurne",
        "long_name": "Moyenne de la variation absolue d'un jour à l'autre de l'amplitude "
                     "thermique diurne",
        "description": "Moyenne {freq:f} de la différence absolue entre les amplitudes "
                       "thermiques diurnes de jours successifs.",
    },
    "atmos.ETR": {
        "title": "Amplitude thermique extrême",
        "long_name": "Amplitude des températures extrêmes de la période",
        "description": "Écart {freq:m} entre le maximum de la température maximale et le "
                       "minimum de la température minimale.",
    },
    # ---- precipitation ----
    "atmos.RR": {
        "title": "Précipitations totales accumulées",
        "long_name": "Précipitations totales accumulées",
        "description": "Précipitations totales {freq:fpl}.",
    },
    "atmos.RR1": {
        "title": "Nombre de jours pluvieux",
        "long_name": "Nombre de jours avec des précipitations d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec des précipitations d'au moins {thresh}.",
    },
    "atmos.R10MM": {
        "title": "Nombre de jours de fortes précipitations",
        "long_name": "Nombre de jours avec des précipitations d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec des précipitations d'au moins {thresh}.",
    },
    "atmos.R20MM": {
        "title": "Nombre de jours de très fortes précipitations",
        "long_name": "Nombre de jours avec des précipitations d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec des précipitations d'au moins {thresh}.",
    },
    "atmos.PRCPTOT": {
        "title": "Précipitations accumulées les jours pluvieux",
        "long_name": "Précipitations totales accumulées les jours avec des précipitations "
                     "d'au moins {thresh}",
        "description": "Précipitations totales {freq:fpl} les jours pluvieux "
                       "(précipitations d'au moins {thresh}).",
    },
    "atmos.SDII": {
        "title": "Intensité moyenne des précipitations les jours pluvieux",
        "long_name": "Précipitations moyennes les jours pluvieux (SDII)",
        "description": "Intensité {freq:f} moyenne des précipitations des jours pluvieux "
                       "(précipitations d'au moins {thresh}).",
    },
    "atmos.RX1DAY": {
        "title": "Précipitations maximales en 1 jour",
        "long_name": "Maximum des précipitations quotidiennes",
        "description": "Maximum {freq:m} des précipitations totales en 1 jour.",
    },
    "atmos.RX5DAY": {
        "title": "Précipitations maximales sur n jours",
        "long_name": "Maximum des précipitations cumulées sur {window} jours",
        "description": "Maximum {freq:m} des précipitations totales cumulées sur une "
                       "fenêtre de {window} jours.",
    },
    "atmos.R75P": {
        "title": "Jours de précipitations supérieures à un centile donné",
        "long_name": "Nombre de jours où le flux de précipitations dépasse le "
                     "{pr_per_thresh}e centile de {pr_per_period}",
        "description": "Nombre {freq:m} de jours avec des précipitations au-dessus d'un "
                       "seuil en centile journalier.",
    },
    "atmos.R95P": {
        "title": "Jours de précipitations supérieures à un centile donné",
        "long_name": "Nombre de jours où le flux de précipitations dépasse le "
                     "{pr_per_thresh}e centile de {pr_per_period}",
        "description": "Nombre {freq:m} de jours avec des précipitations au-dessus d'un "
                       "seuil en centile journalier.",
    },
    "atmos.R99P": {
        "title": "Jours de précipitations supérieures à un centile donné",
        "long_name": "Nombre de jours où le flux de précipitations dépasse le "
                     "{pr_per_thresh}e centile de {pr_per_period}",
        "description": "Nombre {freq:m} de jours avec des précipitations au-dessus d'un "
                       "seuil en centile journalier.",
    },
    "atmos.R75PTOT": {
        "title": "Fraction des précipitations due aux jours de fortes précipitations",
        "long_name": "Fraction des précipitations due aux jours dépassant un seuil en "
                     "centile journalier",
        "description": "Fraction {freq:f} des précipitations totales due aux jours dont "
                       "les précipitations dépassent un seuil en centile journalier.",
    },
    "atmos.R95PTOT": {
        "title": "Fraction des précipitations due aux jours de fortes précipitations",
        "long_name": "Fraction des précipitations due aux jours dépassant un seuil en "
                     "centile journalier",
        "description": "Fraction {freq:f} des précipitations totales due aux jours dont "
                       "les précipitations dépassent un seuil en centile journalier.",
    },
    "atmos.R99PTOT": {
        "title": "Fraction des précipitations due aux jours de fortes précipitations",
        "long_name": "Fraction des précipitations due aux jours dépassant un seuil en "
                     "centile journalier",
        "description": "Fraction {freq:f} des précipitations totales due aux jours dont "
                       "les précipitations dépassent un seuil en centile journalier.",
    },
    "atmos.DRY_DAYS": {
        "title": "Nombre de jours secs",
        "long_name": "Nombre de jours avec des précipitations sous {thresh}",
        "description": "Nombre {freq:m} de jours où les précipitations sont sous {thresh}.",
    },
    # ---- snow (icclim SD family) ----
    "atmos.SD": {
        "title": "Épaisseur de neige moyenne",
        "long_name": "Moyenne de l'épaisseur de neige quotidienne",
        "description": "Moyenne {freq:f} de l'épaisseur de neige quotidienne.",
    },
    "atmos.SD1": {
        "title": "Jours avec neige au sol",
        "long_name": "Nombre de jours avec une épaisseur de neige d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec une épaisseur de neige d'au moins "
                       "{thresh}.",
    },
    "atmos.SD5CM": {
        "title": "Jours avec neige au sol",
        "long_name": "Nombre de jours avec une épaisseur de neige d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec une épaisseur de neige d'au moins "
                       "{thresh}.",
    },
    "atmos.SD50CM": {
        "title": "Jours avec neige au sol",
        "long_name": "Nombre de jours avec une épaisseur de neige d'au moins {thresh}",
        "description": "Nombre {freq:m} de jours avec une épaisseur de neige d'au moins "
                       "{thresh}.",
    },
    # ---- agro ----
    "atmos.BEDD": {
        "title": "Degrés-jours biologiquement efficaces",
        "long_name": "Degrés-jours de croissance biologiquement efficaces",
        "description": "Somme des degrés-jours calculée à partir des températures minimale "
                       "et maximale quotidiennes, ajustée selon la latitude, entre le "
                       "{start_date} et le {end_date}.",
    },
    "atmos.HI": {
        "title": "Indice héliothermique de Huglin",
        "long_name": "Indice héliothermique de Huglin",
        "description": "Indice de sommation thermique pour la viticulture (Huglin).",
    },
}


def main():
    path = Path(__file__).parent.parent / "xclim_tpu" / "data" / "fr.json"
    fr = json.loads(path.read_text())
    for key, entry in HANDWRITTEN.items():
        fr[key] = entry
    path.write_text(json.dumps(fr, ensure_ascii=False, indent=2) + "\n")
    print(f"applied {len(HANDWRITTEN)} hand-written entries; total {len(fr) - 1}")


if __name__ == "__main__":
    main()
