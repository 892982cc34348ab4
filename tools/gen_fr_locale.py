"""Generate French locale entries for every registered indicator.

Pattern-based phrase translation of the English CF metadata (long_name,
description, title). Hand-written entries already present in data/fr.json are
kept untouched; this fills the rest so every indicator has a French
translation (reference scope: xclim:src/xclim/data/fr.json, 236 entries).

Run from the repo root:  python tools/gen_fr_locale.py
"""

from __future__ import annotations

import json
import os
import re
from pathlib import Path

# ordered: longest / most specific first
PHRASES = [
    ("Return level from frequency analysis", "Niveau de retour issu de l'analyse fréquentielle"),
    ("return levels of block maxima", "niveaux de retour des maxima par blocs"),
    ("Tropical nights", "Nuits tropicales"),
    ("Hot spell frequency", "Fréquence des périodes chaudes"),
    ("Hot spell duration", "Durée des périodes chaudes"),
    ("Hot spell maximum length", "Durée maximale des périodes chaudes"),
    ("Hot spell total length", "Durée totale des périodes chaudes"),
    ("Cold spell frequency", "Fréquence des vagues de froid"),
    ("Cold spell duration", "Durée des vagues de froid"),
    ("Cold spell days", "Jours de vague de froid"),
    ("Cold spell maximum length", "Durée maximale des vagues de froid"),
    ("Cold spell total length", "Durée totale des vagues de froid"),
    ("Heat wave frequency", "Fréquence des vagues de chaleur"),
    ("Heat wave index", "Indice de vague de chaleur"),
    ("Heat wave max length", "Durée maximale des vagues de chaleur"),
    ("Heat wave maximum length", "Durée maximale des vagues de chaleur"),
    ("Heat wave total length", "Durée totale des vagues de chaleur"),
    ("Dry spell frequency", "Fréquence des périodes sèches"),
    ("Wet spell frequency", "Fréquence des périodes pluvieuses"),
    ("Freeze-thaw cycles", "Cycles de gel-dégel"),
    ("Frost free season length", "Durée de la saison sans gel"),
    ("Frost free season start", "Début de la saison sans gel"),
    ("Frost free season end", "Fin de la saison sans gel"),
    ("Frost season length", "Durée de la saison de gel"),
    ("Growing season length", "Durée de la saison de croissance"),
    ("Growing season start", "Début de la saison de croissance"),
    ("Growing season end", "Fin de la saison de croissance"),
    ("frequency analysis", "analyse fréquentielle"),
    ("frequency", "fréquence"),
    ("Frequency", "Fréquence"),
    ("First day", "Premier jour"),
    ("Last day", "Dernier jour"),
    ("Calm days", "Jours calmes"),
    ("Windy days", "Jours venteux"),
    ("Summer days", "Jours d'été"),
    ("from a {dist} fit", "à partir d'un ajustement {dist}"),
    ("for {t}-year return periods", "pour des périodes de retour de {t} ans"),
    ("{t}-year return period", "période de retour de {t} ans"),
    ("for at least", "pendant au moins"),
    ("for a ", "pour une "),
    ("for the", "pour le"),
    ("for each", "pour chaque"),
    ("Base flow index", "Indice de débit de base"),
    ("Universal Thermal Climate Index", "Indice universel de climat thermique"),
    ("Sea ice extent", "Étendue de glace de mer"),
    ("Sea ice area", "Superficie de glace de mer"),
    ("ocean areas where sea ice concentration", "zones océaniques où la concentration de glace de mer"),
    ("Longest heat wave", "Plus longue vague de chaleur"),
    ("Longest hot spell", "Plus longue période chaude"),
    ("Longest cold spell", "Plus longue vague de froid"),
    ("Longest spell", "Plus longue période"),
    ("moving average flow divided by the mean flow", "moyenne mobile du débit divisée par le débit moyen"),
    ("Richards-Baker flashiness index", "Indice d'impulsivité de Richards-Baker"),
    ("Maximum number of consecutive days with", "Nombre maximal de jours consécutifs avec"),
    ("Maximum number of consecutive", "Nombre maximal de jours consécutifs de type"),
    ("Number of days with surface wind speed", "Nombre de jours avec une vitesse du vent"),
    ("Number of days with", "Nombre de jours avec"),
    ("Number of days where", "Nombre de jours où"),
    ("Number of days part of", "Nombre de jours appartenant à"),
    ("Number of days in", "Nombre de jours dans"),
    ("Number of days", "Nombre de jours"),
    ("Number of periods of", "Nombre de périodes de"),
    ("Number of events of", "Nombre d'événements de"),
    ("Number of", "Nombre de"),
    ("Maximum consecutive dry days", "Nombre maximal de jours secs consécutifs"),
    ("Maximum consecutive wet days", "Nombre maximal de jours pluvieux consécutifs"),
    ("Maximum length of dry spells", "Durée maximale des périodes sèches"),
    ("Maximum length of wet spells", "Durée maximale des périodes pluvieuses"),
    ("Maximum spell length with", "Durée maximale des périodes avec"),
    ("Maximum duration of", "Durée maximale de"),
    ("Total duration of", "Durée totale de"),
    ("Day of the year of the maximum", "Jour de l'année du maximum de"),
    ("Day of the year of the minimum", "Jour de l'année du minimum de"),
    ("Day of year when", "Jour de l'année où"),
    ("Day of year of", "Jour de l'année de"),
    ("First day of year with", "Premier jour de l'année avec"),
    ("First day of the year with", "Premier jour de l'année avec"),
    ("First day where", "Premier jour où"),
    ("First day of", "Premier jour de"),
    ("Last day of", "Dernier jour de"),
    ("Longest spell of", "Plus longue période de"),
    ("Longest run of", "Plus longue séquence de"),
    ("mean daily temperature", "la température moyenne quotidienne"),
    ("daily mean temperature", "la température moyenne quotidienne"),
    ("daily minimum temperature", "la température minimale quotidienne"),
    ("daily maximum temperature", "la température maximale quotidienne"),
    ("minimum temperature", "température minimale"),
    ("maximum temperature", "température maximale"),
    ("mean temperature", "température moyenne"),
    ("Mean daily mean temperature", "Moyenne de la température moyenne quotidienne"),
    ("Maximum daily mean temperature", "Maximum de la température moyenne quotidienne"),
    ("Minimum daily mean temperature", "Minimum de la température moyenne quotidienne"),
    ("Mean daily minimum temperature", "Moyenne de la température minimale quotidienne"),
    ("Maximum daily minimum temperature", "Maximum de la température minimale quotidienne"),
    ("Minimum daily minimum temperature", "Minimum de la température minimale quotidienne"),
    ("Mean daily maximum temperature", "Moyenne de la température maximale quotidienne"),
    ("Maximum daily maximum temperature", "Maximum de la température maximale quotidienne"),
    ("Minimum daily maximum temperature", "Minimum de la température maximale quotidienne"),
    ("Mean of daily mean wind strength", "Moyenne de la vitesse moyenne quotidienne du vent"),
    ("Maximum value of daily maximum wind gust strength",
     "Maximum des rafales de vent maximales quotidiennes"),
    ("Maximum daily mean wind speed", "Maximum de la vitesse moyenne quotidienne du vent"),
    ("Mean daily mean wind speed", "Moyenne de la vitesse moyenne quotidienne du vent"),
    ("Minimum daily mean wind speed", "Minimum de la vitesse moyenne quotidienne du vent"),
    ("Maximum daily maximum wind speed", "Maximum de la vitesse maximale quotidienne du vent"),
    ("Mean daily maximum wind speed", "Moyenne de la vitesse maximale quotidienne du vent"),
    ("Minimum daily maximum wind speed", "Minimum de la vitesse maximale quotidienne du vent"),
    ("wind speed at or above", "vitesse du vent supérieure ou égale à"),
    ("wind speed below", "vitesse du vent inférieure à"),
    ("surface wind speed", "vitesse du vent en surface"),
    ("wind speed", "vitesse du vent"),
    ("precipitation accumulation", "cumul des précipitations"),
    ("total precipitation", "précipitations totales"),
    ("solid precipitation", "précipitations solides"),
    ("liquid precipitation", "précipitations liquides"),
    ("precipitation intensity", "intensité des précipitations"),
    ("precipitation flux", "flux de précipitations"),
    ("precipitation amount", "quantité de précipitations"),
    ("precipitation", "précipitations"),
    ("Cumulative sum of temperature degrees above", "Somme cumulée des degrés de température au-dessus de"),
    ("Cumulative sum of temperature degrees below", "Somme cumulée des degrés de température en dessous de"),
    ("Cooling degree days", "Degrés-jours de climatisation"),
    ("Heating degree days", "Degrés-jours de chauffage"),
    ("Growing degree days", "Degrés-jours de croissance"),
    ("growing degree days", "degrés-jours de croissance"),
    ("degree days above", "degrés-jours au-dessus de"),
    ("degree days below", "degrés-jours en dessous de"),
    ("Degree days above", "Degrés-jours au-dessus de"),
    ("Degree days below", "Degrés-jours en dessous de"),
    ("degree days", "degrés-jours"),
    ("growing season length", "durée de la saison de croissance"),
    ("growing season", "saison de croissance"),
    ("frost free season", "saison sans gel"),
    ("frost-free season", "saison sans gel"),
    ("frost season", "saison de gel"),
    ("frost days", "jours de gel"),
    ("frost day", "jour de gel"),
    ("ice days", "jours sans dégel"),
    ("summer days", "jours d'été"),
    ("tropical nights", "nuits tropicales"),
    ("heat wave", "vague de chaleur"),
    ("cold spell", "vague de froid"),
    ("hot spell", "période chaude"),
    ("warm spell", "période chaude"),
    ("dry spells", "périodes sèches"),
    ("dry spell", "période sèche"),
    ("wet spells", "périodes pluvieuses"),
    ("wet spell", "période pluvieuse"),
    ("dry days", "jours secs"),
    ("dry periods", "périodes sèches"),
    ("wet days", "jours pluvieux"),
    ("wet day", "jour pluvieux"),
    ("rain on frozen ground", "pluie sur sol gelé"),
    ("snowfall", "chutes de neige"),
    ("snow depth", "épaisseur de neige"),
    ("snow amount", "quantité de neige"),
    ("snow cover", "couverture de neige"),
    ("snow water equivalent", "équivalent en eau de la neige"),
    ("snowmelt", "fonte de neige"),
    ("snow melt", "fonte de neige"),
    ("blowing snow", "poudrerie"),
    ("snow", "neige"),
    ("streamflow", "débit"),
    ("base flow", "débit de base"),
    ("high flows", "hauts débits"),
    ("low flows", "bas débits"),
    ("sea ice extent", "étendue de glace de mer"),
    ("sea ice area", "superficie de glace de mer"),
    ("relative humidity", "humidité relative"),
    ("specific humidity", "humidité spécifique"),
    ("dewpoint temperature", "température du point de rosée"),
    ("vapor pressure deficit", "déficit de pression de vapeur"),
    ("vapor pressure", "pression de vapeur"),
    ("potential evapotranspiration", "évapotranspiration potentielle"),
    ("evapotranspiration", "évapotranspiration"),
    ("water budget", "bilan hydrique"),
    ("diurnal temperature range", "amplitude thermique diurne"),
    ("temperature range", "amplitude thermique"),
    ("day-to-day variation", "variation d'un jour à l'autre"),
    ("return level", "niveau de retour"),
    ("return period", "période de retour"),
    ("distribution parameters", "paramètres de la distribution"),
    ("percentile of", "percentile de"),
    ("percentile", "percentile"),
    ("at or above given thresholds", "supérieures ou égales aux seuils donnés"),
    ("at or above", "supérieure ou égale à"),
    ("at or below", "inférieure ou égale à"),
    ("above the", "au-dessus du"),
    ("below the", "en dessous du"),
    ("is exceeded for at least", "est dépassé pendant au moins"),
    ("exceeds", "dépasse"),
    ("above", "supérieure à"),
    ("below", "inférieure à"),
    ("between", "entre"),
    ("Maximum of", "Maximum de"),
    ("Minimum of", "Minimum de"),
    ("Mean of", "Moyenne de"),
    ("Sum of", "Somme de"),
    ("Maximum", "Maximum"),
    ("Minimum", "Minimum"),
    ("Average", "Moyenne"),
    ("Mean", "Moyenne"),
    ("Total", "Total"),
    ("temperature", "température"),
    ("temperatures", "températures"),
    ("humidity", "humidité"),
    ("pressure", "pression"),
    ("radiation", "rayonnement"),
    ("longest", "le plus long"),
    ("spell length", "durée des périodes"),
    ("spells", "périodes"),
    ("spell", "période"),
    ("events", "événements"),
    ("event", "événement"),
    ("consecutive days", "jours consécutifs"),
    ("calendar days", "jours calendaires"),
    ("days", "jours"),
    ("day(s)", "jour(s)"),
    ("day", "jour"),
    ("nights", "nuits"),
    ("year", "année"),
    ("the integral of", "l'intégrale de"),
    ("with at least", "avec au moins"),
    ("at least", "au moins"),
    ("for at least", "pendant au moins"),
    ("over a given period", "sur une période donnée"),
    ("per period", "par période"),
    ("in each period", "dans chaque période"),
    ("of the period", "de la période"),
    ("of the", "du"),
    ("of each", "de chaque"),
    ("where the", "où la"),
    ("where", "où"),
    ("with a", "avec une"),
    ("with", "avec"),
    ("and", "et"),
    ("or more", "ou plus"),
    ("threshold", "seuil"),
    ("thresholds", "seuils"),
    ("conditions", "conditions"),
    ("index", "indice"),
]

# grammar fixes after blind replacement
FIXUPS = [
    ("période chaudes", "périodes chaudes"),
    ("période sèches", "périodes sèches"),
    ("période pluvieuses", "périodes pluvieuses"),
    ("vague de froids", "vagues de froid"),
    ("vague de chaleurs", "vagues de chaleur"),
    ("nombre de période chaude événements", "nombre de périodes chaudes"),
    ("nombre de vague de froid événements", "nombre de vagues de froid"),
    ("nombre de vague de chaleur événements", "nombre de vagues de chaleur"),
    ("nombre de période sèche événements", "nombre de périodes sèches"),
    ("Nombre de période chaude événements", "Nombre de périodes chaudes"),
    ("Nombre de vague de froid événements", "Nombre de vagues de froid"),
    (" for ", " pour "),
    (" from ", " à partir de "),
    (" of ", " de "),
    (" the ", " "),
    (" a ", " un "),
    (" in ", " dans "),
    (" per ", " par "),
    (" to ", " à "),
    (" is ", " est "),
    (" are ", " sont "),
    ("précipitations supérieure à", "précipitations supérieures à"),
    ("précipitations inférieure à", "précipitations inférieures à"),
    ("précipitations supérieure ou égale", "précipitations supérieures ou égales"),
    ("précipitations inférieure ou égale", "précipitations inférieures ou égales"),
    ("jours supérieure", "jours supérieurs"),
    ("jours inférieure", "jours inférieurs"),
    ("débit supérieure", "débit supérieur"),
    ("débit inférieure", "débit inférieur"),
    ("vent supérieure", "vent supérieure"),
    ("seuil supérieure", "seuil supérieur"),
    ("  ", " "),
]


def translate(text: str) -> str:
    out = text
    for en, fr in PHRASES:
        out = out.replace(en, fr)
        # lowercase variant when the phrase starts a capital
        if en[0].isupper():
            out = out.replace(en[0].lower() + en[1:], fr[0].lower() + fr[1:])
    for a, b in FIXUPS:
        out = out.replace(a, b)
    return out


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import xclim_tpu  # noqa: F401  (populates the registry)
    from xclim_tpu.core.indicator import registry

    path = Path(__file__).parent.parent / "xclim_tpu" / "data" / "fr.json"
    fr = json.loads(path.read_text())
    added = 0
    for key, ind in sorted(registry.items()):
        rid = ind._registry_id
        if rid in fr:
            continue  # keep hand-written entries
        attrs = ind.cf_attrs[0]
        entry = {}
        if ind.title:
            entry["title"] = translate(ind.title)
        if attrs.get("long_name"):
            entry["long_name"] = translate(attrs["long_name"])
        if attrs.get("description"):
            entry["description"] = translate(attrs["description"])
        if entry:
            fr[rid] = entry
            added += 1
    path.write_text(json.dumps(fr, ensure_ascii=False, indent=2) + "\n")
    print(f"added {added} entries; total {len(fr) - 1}")


if __name__ == "__main__":
    main()
