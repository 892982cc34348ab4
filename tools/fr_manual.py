"""Hand-written French locale entries (VERDICT r1 #9).

Idiomatic French for every indicator whose machine-generated phrasing was
franglais. Applied over xclim_tpu/data/fr.json by ``python tools/fr_manual.py``;
tools/gen_fr_locale.py only fills keys absent from fr.json, so these stay
authoritative across regenerations. Phrasing follows the conventions of the
reference's hand-written locale (xclim:src/xclim/data/fr.json): «Nombre
{freq:m} de jours…», «Moyenne {freq:f}…», centile (pas «percentile»),
vague de chaleur / période sèche, etc.
"""

from __future__ import annotations

import json
from pathlib import Path

MANUAL = {
    # ------------------------------------------------------------------
    # température : statistiques de base
    # ------------------------------------------------------------------
    "atmos.TMM": {
        "long_name": "Moyenne de la température moyenne quotidienne",
        "title": "Moyenne de la température moyenne quotidienne",
        "description": "Moyenne {freq:f} de la température moyenne quotidienne.",
    },
    "atmos.TMMAX": {
        "long_name": "Maximum de la température moyenne quotidienne",
        "title": "Maximum de la température moyenne quotidienne",
        "description": "Maximum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TMMEAN": {
        "long_name": "Moyenne de la température moyenne quotidienne",
        "title": "Moyenne de la température moyenne quotidienne",
        "description": "Moyenne {freq:f} de la température moyenne quotidienne.",
    },
    "atmos.TMMIN": {
        "long_name": "Minimum de la température moyenne quotidienne",
        "title": "Minimum de la température moyenne quotidienne",
        "description": "Minimum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TMN": {
        "long_name": "Minimum de la température moyenne quotidienne",
        "title": "Minimum de la température moyenne quotidienne",
        "description": "Minimum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TMX": {
        "long_name": "Maximum de la température moyenne quotidienne",
        "title": "Maximum de la température moyenne quotidienne",
        "description": "Maximum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TNM": {
        "long_name": "Moyenne de la température minimale quotidienne",
        "title": "Moyenne de la température minimale quotidienne",
        "description": "Moyenne {freq:f} de la température minimale quotidienne.",
    },
    "atmos.TNMAX": {
        "long_name": "Maximum de la température minimale quotidienne",
        "title": "Maximum de la température minimale quotidienne",
        "description": "Maximum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TNMEAN": {
        "long_name": "Moyenne de la température minimale quotidienne",
        "title": "Moyenne de la température minimale quotidienne",
        "description": "Moyenne {freq:f} de la température minimale quotidienne.",
    },
    "atmos.TNMIN": {
        "long_name": "Minimum de la température minimale quotidienne",
        "title": "Minimum de la température minimale quotidienne",
        "description": "Minimum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TXM": {
        "long_name": "Moyenne de la température maximale quotidienne",
        "title": "Moyenne de la température maximale quotidienne",
        "description": "Moyenne {freq:f} de la température maximale quotidienne.",
    },
    "atmos.TXMAX": {
        "long_name": "Maximum de la température maximale quotidienne",
        "title": "Maximum de la température maximale quotidienne",
        "description": "Maximum {freq:m} de la température maximale quotidienne.",
    },
    "atmos.TXMEAN": {
        "long_name": "Moyenne de la température maximale quotidienne",
        "title": "Moyenne de la température maximale quotidienne",
        "description": "Moyenne {freq:f} de la température maximale quotidienne.",
    },
    "atmos.TXMIN": {
        "long_name": "Minimum de la température maximale quotidienne",
        "title": "Minimum de la température maximale quotidienne",
        "description": "Minimum {freq:m} de la température maximale quotidienne.",
    },
    "atmos.TN_MAX": {
        "long_name": "Maximum de la température minimale quotidienne",
        "title": "Maximum de la température minimale",
        "description": "Maximum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TN_MEAN": {
        "long_name": "Moyenne de la température minimale quotidienne",
        "title": "Moyenne de la température minimale",
        "description": "Moyenne {freq:f} de la température minimale quotidienne.",
    },
    "atmos.TN_MIN": {
        "long_name": "Minimum de la température minimale quotidienne",
        "title": "Minimum de la température minimale",
        "description": "Minimum {freq:m} de la température minimale quotidienne.",
    },
    "atmos.TX_MEAN": {
        "long_name": "Moyenne de la température maximale quotidienne",
        "title": "Moyenne de la température maximale",
        "description": "Moyenne {freq:f} de la température maximale quotidienne.",
    },
    "atmos.TX_MIN": {
        "long_name": "Minimum de la température maximale quotidienne",
        "title": "Minimum de la température maximale",
        "description": "Minimum {freq:m} de la température maximale quotidienne.",
    },
    "atmos.TG_DAYS_ABOVE": {
        "long_name": "Nombre de jours où la température moyenne quotidienne dépasse {thresh}",
        "title": "Jours avec température moyenne supérieure à un seuil",
        "description": "Nombre {freq:m} de jours où la température moyenne quotidienne dépasse {thresh}.",
    },
    "atmos.TG_DAYS_BELOW": {
        "long_name": "Nombre de jours où la température moyenne quotidienne est sous {thresh}",
        "title": "Jours avec température moyenne inférieure à un seuil",
        "description": "Nombre {freq:m} de jours où la température moyenne quotidienne est sous {thresh}.",
    },
    "atmos.TN_DAYS_ABOVE": {
        "long_name": "Nombre de jours où la température minimale quotidienne dépasse {thresh}",
        "title": "Jours avec température minimale supérieure à un seuil",
        "description": "Nombre {freq:m} de jours où la température minimale quotidienne dépasse {thresh}.",
    },
    "atmos.TN_DAYS_BELOW": {
        "long_name": "Nombre de jours où la température minimale quotidienne est sous {thresh}",
        "title": "Jours avec température minimale inférieure à un seuil",
        "description": "Nombre {freq:m} de jours où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.TX_DAYS_BELOW": {
        "long_name": "Nombre de jours où la température maximale quotidienne est sous {thresh}",
        "title": "Jours avec température maximale inférieure à un seuil",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne est sous {thresh}.",
    },
    "atmos.TX_TN_DAYS_ABOVE": {
        "long_name": "Nombre de jours avec température maximale supérieure à {thresh_tasmax} et température minimale supérieure à {thresh_tasmin}",
        "title": "Jours chauds de jour comme de nuit",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne dépasse {thresh_tasmax} et où la température minimale quotidienne dépasse {thresh_tasmin}.",
    },
    "atmos.HOT_DAYS": {
        "long_name": "Nombre de jours où la température maximale quotidienne dépasse {thresh}",
        "title": "Jours chauds",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.MEAN_TEMPERATURE_FROM_MAX_AND_MIN": {
        "long_name": "Température moyenne quotidienne estimée",
        "title": "Température moyenne à partir des températures maximale et minimale",
        "description": "Température moyenne quotidienne estimée par la demi-somme des températures maximale et minimale quotidiennes.",
    },
    "atmos.DTRMAX": {
        "long_name": "Maximum de l'amplitude thermique diurne",
        "title": "Maximum de l'amplitude thermique diurne",
        "description": "Maximum {freq:m} de l'amplitude thermique diurne.",
    },
    "atmos.MAXDTR": {
        "long_name": "Maximum de l'amplitude thermique diurne",
        "title": "Maximum de l'amplitude thermique diurne",
        "description": "Maximum {freq:m} de l'amplitude thermique diurne.",
    },
    "atmos.DTRVAR": {
        "long_name": "Variation moyenne d'un jour à l'autre de l'amplitude thermique diurne",
        "title": "Variabilité de l'amplitude thermique diurne",
        "description": "Moyenne {freq:f} de la différence absolue entre les amplitudes thermiques diurnes de jours successifs.",
    },
    # ------------------------------------------------------------------
    # vagues, périodes et séquences
    # ------------------------------------------------------------------
    "atmos.COLD_SPELL_DURATION_INDEX": {
        "long_name": "Nombre de jours appartenant à une séquence d'au moins {window} jours où la température minimale est sous le 10e centile",
        "title": "Indice de durée des vagues de froid",
        "description": "Nombre {freq:m} de jours appartenant à une séquence d'au moins {window} jours consécutifs où la température minimale quotidienne est sous le 10e centile journalier.",
    },
    "atmos.COLD_SPELL_FREQUENCY": {
        "long_name": "Nombre de vagues de froid",
        "title": "Fréquence des vagues de froid",
        "description": "Nombre {freq:m} de vagues de froid (au moins {window} jours consécutifs avec une température moyenne sous {thresh}).",
    },
    "atmos.COLD_SPELL_MAX_LENGTH": {
        "long_name": "Plus longue vague de froid (température moyenne sous {thresh})",
        "title": "Plus longue vague de froid",
        "description": "Durée maximale {freq:f} des séquences d'au moins {window} jours consécutifs avec une température moyenne sous {thresh}.",
    },
    "atmos.COLD_SPELL_TOTAL_LENGTH": {
        "long_name": "Nombre total de jours dans les vagues de froid (température moyenne sous {thresh})",
        "title": "Durée totale des vagues de froid",
        "description": "Nombre total {freq:m} de jours appartenant à des vagues de froid d'au moins {window} jours avec une température moyenne sous {thresh}.",
    },
    "atmos.HOT_SPELL_MAX_LENGTH": {
        "long_name": "Plus longue période chaude (température maximale au-dessus de {thresh})",
        "title": "Plus longue période chaude",
        "description": "Durée maximale {freq:f} des séquences d'au moins {window} jours consécutifs avec une température maximale au-dessus de {thresh}.",
    },
    "atmos.HOT_SPELL_MAX_MAGNITUDE": {
        "long_name": "Magnitude maximale des périodes chaudes",
        "title": "Magnitude maximale des périodes chaudes",
        "description": "Excès cumulatif maximal {freq:m} de température au-dessus de {thresh} parmi les périodes chaudes d'au moins {window} jours.",
    },
    "atmos.HOT_SPELL_TOTAL_LENGTH": {
        "long_name": "Nombre total de jours dans les périodes chaudes (température maximale au-dessus de {thresh})",
        "title": "Durée totale des périodes chaudes",
        "description": "Nombre total {freq:m} de jours appartenant à des périodes chaudes d'au moins {window} jours avec une température maximale au-dessus de {thresh}.",
    },
    "atmos.HEAT_SPELL_FREQUENCY": {
        "long_name": "Nombre de périodes de chaleur",
        "title": "Fréquence des périodes de chaleur",
        "description": "Nombre {freq:m} de périodes de chaleur, c'est-à-dire des séquences où les moyennes sur {window} jours des températures minimale et maximale quotidiennes dépassent respectivement {thresh_tasmin} et {thresh_tasmax}.",
    },
    "atmos.HEAT_SPELL_MAX_LENGTH": {
        "long_name": "Plus longue période de chaleur",
        "title": "Plus longue période de chaleur",
        "description": "Durée maximale {freq:f} des périodes de chaleur, c'est-à-dire des séquences où les moyennes sur {window} jours des températures minimale et maximale quotidiennes dépassent respectivement {thresh_tasmin} et {thresh_tasmax}.",
    },
    "atmos.HEAT_SPELL_TOTAL_LENGTH": {
        "long_name": "Durée totale des périodes de chaleur",
        "title": "Durée totale des périodes de chaleur",
        "description": "Nombre total {freq:m} de jours appartenant à des périodes de chaleur, c'est-à-dire des séquences où les moyennes sur {window} jours des températures minimale et maximale quotidiennes dépassent respectivement {thresh_tasmin} et {thresh_tasmax}.",
    },
    "atmos.HEAT_WAVE_TOTAL_LENGTH": {
        "long_name": "Nombre total de jours dans les vagues de chaleur",
        "title": "Durée totale des vagues de chaleur",
        "description": "Nombre total {freq:m} de jours appartenant à des vagues de chaleur (température minimale au-dessus de {thresh_tasmin} et température maximale au-dessus de {thresh_tasmax} pendant au moins {window} jours).",
    },
    "atmos.WARM_SPELL_DURATION_INDEX": {
        "long_name": "Nombre de jours appartenant à une séquence d'au moins {window} jours où la température maximale dépasse le 90e centile",
        "title": "Indice de durée des périodes chaudes",
        "description": "Nombre {freq:m} de jours appartenant à une séquence d'au moins {window} jours consécutifs où la température maximale quotidienne dépasse le 90e centile journalier.",
    },
    "atmos.CONSECUTIVE_FROST_DAYS": {
        "long_name": "Nombre maximal de jours de gel consécutifs (température minimale sous {thresh})",
        "title": "Jours de gel consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.CONSECUTIVE_FROST_FREE_DAYS": {
        "long_name": "Nombre maximal de jours sans gel consécutifs (température minimale au moins {thresh})",
        "title": "Jours sans gel consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température minimale quotidienne est supérieure ou égale à {thresh}.",
    },
    "atmos.MAXIMUM_CONSECUTIVE_TX_DAYS": {
        "long_name": "Nombre maximal de jours consécutifs avec température maximale au-dessus de {thresh}",
        "title": "Jours chauds consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.MAXIMUM_CONSECUTIVE_WARM_DAYS": {
        "long_name": "Nombre maximal de jours consécutifs avec température maximale au-dessus de {thresh}",
        "title": "Jours chauds consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.FREEZETHAW_SPELL_FREQUENCY": {
        "long_name": "Nombre de périodes de gel-dégel d'au moins {window} jours",
        "title": "Fréquence des périodes de gel-dégel",
        "description": "Nombre {freq:m} de périodes d'au moins {window} jours consécutifs présentant un cycle de gel-dégel : température maximale quotidienne au-dessus de {thresh_tasmax} et température minimale quotidienne inférieure ou égale à {thresh_tasmin}.",
    },
    "atmos.FREEZETHAW_SPELL_MAX_LENGTH": {
        "long_name": "Durée maximale des périodes de gel-dégel d'au moins {window} jours",
        "title": "Plus longue période de gel-dégel",
        "description": "Durée maximale {freq:f} des périodes d'au moins {window} jours consécutifs présentant un cycle de gel-dégel : température maximale quotidienne au-dessus de {thresh_tasmax} et température minimale quotidienne inférieure ou égale à {thresh_tasmin}.",
    },
    "atmos.FREEZETHAW_SPELL_MEAN_LENGTH": {
        "long_name": "Durée moyenne des périodes de gel-dégel d'au moins {window} jours",
        "title": "Durée moyenne des périodes de gel-dégel",
        "description": "Durée moyenne {freq:f} des périodes d'au moins {window} jours consécutifs présentant un cycle de gel-dégel : température maximale quotidienne au-dessus de {thresh_tasmax} et température minimale quotidienne inférieure ou égale à {thresh_tasmin}.",
    },
    "atmos.DLYFRZTHW": {
        "long_name": "Nombre de jours avec un cycle de gel-dégel diurne",
        "title": "Cycles de gel-dégel quotidiens",
        "description": "Nombre {freq:m} de jours présentant un cycle de gel-dégel diurne : température maximale quotidienne au-dessus de {thresh_tasmax} et température minimale quotidienne inférieure ou égale à {thresh_tasmin}.",
    },
    "atmos.FROST_FREE_SEASON_END": {
        "long_name": "Dernier jour de la saison sans gel",
        "title": "Fin de la saison sans gel",
        "description": "Jour de l'année marquant la fin de la saison sans gel.",
    },
    "atmos.FROST_FREE_SEASON_LENGTH": {
        "long_name": "Durée de la saison sans gel",
        "title": "Durée de la saison sans gel",
        "description": "Nombre {freq:m} de jours entre le début et la fin de la saison sans gel (température minimale supérieure ou égale à {thresh} pendant au moins {window} jours consécutifs).",
    },
    "atmos.FROST_FREE_SEASON_START": {
        "long_name": "Premier jour de la saison sans gel",
        "title": "Début de la saison sans gel",
        "description": "Jour de l'année marquant le début de la saison sans gel (température minimale supérieure ou égale à {thresh} pendant au moins {window} jours consécutifs).",
    },
    "atmos.FROST_FREE_SPELL_MAX_LENGTH": {
        "long_name": "Durée maximale des périodes sans gel d'au moins {window} jours",
        "title": "Plus longue période sans gel",
        "description": "Durée maximale {freq:f} des périodes d'au moins {window} jours consécutifs avec une température minimale supérieure ou égale à {thresh}.",
    },
    "atmos.FROST_SEASON_LENGTH": {
        "long_name": "Durée de la saison de gel",
        "title": "Durée de la saison de gel",
        "description": "Nombre {freq:m} de jours entre la première occurrence d'au moins {window} jours consécutifs avec une température minimale quotidienne sous le point de congélation et la première occurrence, après le {mid_date}, d'au moins {window} jours consécutifs au-dessus du point de congélation.",
    },
    "atmos.LAST_SPRING_FROST": {
        "long_name": "Dernier gel printanier (température minimale sous {thresh})",
        "title": "Dernier gel printanier",
        "description": "Jour de l'année du dernier gel printanier : dernière température minimale quotidienne sous {thresh} avant le {before_date}.",
    },
    "atmos.LATE_FROST_DAYS": {
        "long_name": "Nombre de jours de gel tardif (température minimale sous {thresh})",
        "title": "Jours de gel tardif",
        "description": "Nombre {freq:m} de jours où la température minimale quotidienne est sous {thresh} pendant la période {indexer}.",
    },
    "atmos.FIRST_DAY_TG_ABOVE": {
        "long_name": "Premier jour de l'année avec température moyenne au-dessus de {thresh}",
        "title": "Premier jour avec température moyenne supérieure à un seuil",
        "description": "Premier jour de l'année où la température moyenne quotidienne dépasse {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FIRST_DAY_TG_BELOW": {
        "long_name": "Premier jour de l'année avec température moyenne sous {thresh}",
        "title": "Premier jour avec température moyenne inférieure à un seuil",
        "description": "Premier jour de l'année où la température moyenne quotidienne est sous {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FIRST_DAY_TN_ABOVE": {
        "long_name": "Premier jour de l'année avec température minimale au-dessus de {thresh}",
        "title": "Premier jour avec température minimale supérieure à un seuil",
        "description": "Premier jour de l'année où la température minimale quotidienne dépasse {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FIRST_DAY_TN_BELOW": {
        "long_name": "Premier jour de l'année avec température minimale sous {thresh}",
        "title": "Premier jour avec température minimale inférieure à un seuil",
        "description": "Premier jour de l'année où la température minimale quotidienne est sous {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FIRST_DAY_TX_ABOVE": {
        "long_name": "Premier jour de l'année avec température maximale au-dessus de {thresh}",
        "title": "Premier jour avec température maximale supérieure à un seuil",
        "description": "Premier jour de l'année où la température maximale quotidienne dépasse {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FIRST_DAY_TX_BELOW": {
        "long_name": "Premier jour de l'année avec température maximale sous {thresh}",
        "title": "Premier jour avec température maximale inférieure à un seuil",
        "description": "Premier jour de l'année où la température maximale quotidienne est sous {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.GROWING_SEASON_END": {
        "long_name": "Dernier jour de la saison de croissance",
        "title": "Fin de la saison de croissance",
        "description": "Jour de l'année marquant la fin de la saison de croissance : température sous {thresh} pendant au moins {window} jours consécutifs après le {mid_date}.",
    },
    "atmos.GROWING_SEASON_START": {
        "long_name": "Premier jour de la saison de croissance",
        "title": "Début de la saison de croissance",
        "description": "Jour de l'année où la température dépasse {thresh} pendant au moins {window} jours consécutifs.",
    },
    "atmos.FRESHET_START": {
        "long_name": "Début de la crue printanière",
        "title": "Début de la crue printanière",
        "description": "Jour de l'année marquant le début de la crue printanière : température moyenne au-dessus de {thresh} pendant au moins {window} jours consécutifs.",
    },
    # ------------------------------------------------------------------
    # degrés-jours et indices agro
    # ------------------------------------------------------------------
    "atmos.COOLING_DEGREE_DAYS_APPROXIMATION": {
        "long_name": "Degrés-jours de climatisation approchés à partir des températures minimale et maximale",
        "title": "Approximation des degrés-jours de climatisation",
        "description": "Somme {freq:f} des degrés-jours au-dessus de {thresh}, approchée à partir des températures minimale, maximale et moyenne quotidiennes (méthode du UK Met Office).",
    },
    "atmos.HEATING_DEGREE_DAYS_APPROXIMATION": {
        "long_name": "Degrés-jours de chauffage approchés à partir des températures minimale et maximale",
        "title": "Approximation des degrés-jours de chauffage",
        "description": "Somme {freq:f} des degrés-jours sous {thresh}, approchée à partir des températures minimale, maximale et moyenne quotidiennes (méthode du UK Met Office).",
    },
    "atmos.FREEZING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de gel (température moyenne sous {thresh})",
        "title": "Degrés-jours de gel",
        "description": "Somme {freq:f} des degrés-jours sous {thresh} (température moyenne quotidienne).",
    },
    "atmos.THAWING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de dégel (température moyenne au-dessus de {thresh})",
        "title": "Degrés-jours de dégel",
        "description": "Somme {freq:f} des degrés-jours au-dessus de {thresh} (température moyenne quotidienne).",
    },
    "atmos.DEGREE_DAYS_EXCEEDANCE_DATE": {
        "long_name": "Jour de l'année où la somme des degrés-jours (température moyenne {op} {thresh}) dépasse {sum_thresh}",
        "title": "Date de dépassement d'un cumul de degrés-jours",
        "description": "Jour de l'année où la somme des degrés-jours (température moyenne quotidienne {op} {thresh}) dépasse {sum_thresh}.",
    },
    "atmos.BIOLOGICALLY_EFFECTIVE_DEGREE_DAYS": {
        "long_name": "Degrés-jours de croissance biologiquement efficaces",
        "title": "Degrés-jours biologiquement efficaces",
        "description": "Somme des degrés-jours calculée à partir des températures minimale et maximale quotidiennes, ajustée selon la latitude, entre le {start_date} et le {end_date}.",
    },
    "atmos.EFFECTIVE_GROWING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de croissance effectifs (température moyenne au-dessus de {thresh})",
        "title": "Degrés-jours de croissance effectifs",
        "description": "Somme {freq:f} des degrés-jours au-dessus de {thresh} entre un début de saison de croissance déterminé par la méthode {method} et le premier gel d'automne après le {after_date}.",
    },
    "atmos.CORN_HEAT_UNITS": {
        "long_name": "Unités thermiques maïs (Tmin > {thresh_tasmin} et Tmax > {thresh_tasmax})",
        "title": "Unités thermiques maïs",
        "description": "Indice thermique de développement du maïs, calculé à partir des températures minimale et maximale quotidiennes.",
    },
    "atmos.CP": {
        "long_name": "Portions de froid selon le modèle dynamique",
        "title": "Portions de froid",
        "description": "Portions de froid estimant le potentiel de débourrement des cultures, selon le modèle dynamique en deux étapes d'accumulation de froid (exige des températures horaires).",
    },
    "atmos.CU": {
        "long_name": "Unités de froid selon le modèle de l'Utah",
        "title": "Unités de froid",
        "description": "Unités de froid estimant le potentiel de débourrement des cultures, selon les pondérations horaires du modèle de l'Utah.",
    },
    "atmos.COOL_NIGHT_INDEX": {
        "long_name": "Moyenne des températures minimales en fin d'été",
        "title": "Indice des nuits fraîches",
        "description": "Moyenne de la température minimale quotidienne en septembre (hémisphère nord) ou en mars (hémisphère sud) ; un indice viticole de maturation.",
    },
    "atmos.DRYNESS_INDEX": {
        "long_name": "Indice de sécheresse de la saison de croissance",
        "title": "Indice de sécheresse",
        "description": "Estimation de l'humidité du sol pendant la saison de croissance : réserve initiale plus précipitations, moins transpiration potentielle ajustée et évaporation (avril à septembre dans l'hémisphère nord).",
    },
    "atmos.HUGLIN_INDEX": {
        "long_name": "Indice héliothermique de Huglin",
        "title": "Indice héliothermique de Huglin",
        "description": "Indice de sommation thermique pour la viticulture (Huglin).",
    },
    "atmos.LATITUDE_TEMPERATURE_INDEX": {
        "long_name": "Indice latitude-température",
        "title": "Indice latitude-température",
        "description": "Indice d'aptitude viticole : température moyenne du mois le plus chaud multipliée par ({lat_factor} moins la latitude).",
    },
    "atmos.AUSTRALIAN_HARDINESS_ZONES": {
        "long_name": "Zones de rusticité (échelle australienne)",
        "title": "Zones de rusticité australiennes",
        "description": "Classification de l'aptitude des plantes fondée sur la moyenne mobile sur {window} ans du minimum annuel de température (zones ANBG de 5 °C).",
    },
    "atmos.USDA_HARDINESS_ZONES": {
        "long_name": "Zones de rusticité (échelle USDA)",
        "title": "Zones de rusticité USDA",
        "description": "Classification de l'aptitude des plantes fondée sur la moyenne mobile sur {window} ans du minimum annuel de température (zones USDA de 10 °F avec demi-zones).",
    },
    "atmos.QIAN_WEIGHTED_MEAN_AVERAGE": {
        "long_name": "Température moyenne pondérée de Qian",
        "title": "Température moyenne pondérée de Qian",
        "description": "Moyenne pondérée des températures moyennes quotidiennes selon Qian, lissant la série pour la détection du début de la saison de croissance.",
    },
    # ------------------------------------------------------------------
    # précipitations
    # ------------------------------------------------------------------
    "atmos.COLD_AND_DRY_DAYS": {
        "long_name": "Nombre de jours froids (< 25e centile) et secs (< 25e centile)",
        "title": "Jours froids et secs",
        "description": "Nombre {freq:m} de jours à la fois froids (température sous le 25e centile) et secs (précipitations sous le 25e centile).",
    },
    "atmos.COLD_AND_WET_DAYS": {
        "long_name": "Nombre de jours froids (< 25e centile) et pluvieux (> 75e centile)",
        "title": "Jours froids et pluvieux",
        "description": "Nombre {freq:m} de jours à la fois froids (température sous le 25e centile) et pluvieux (précipitations au-dessus du 75e centile).",
    },
    "atmos.WARM_AND_DRY_DAYS": {
        "long_name": "Nombre de jours chauds (> 75e centile) et secs (< 25e centile)",
        "title": "Jours chauds et secs",
        "description": "Nombre {freq:m} de jours à la fois chauds (température au-dessus du 75e centile) et secs (précipitations sous le 25e centile).",
    },
    "atmos.WARM_AND_WET_DAYS": {
        "long_name": "Nombre de jours chauds (> 75e centile) et pluvieux (> 75e centile)",
        "title": "Jours chauds et pluvieux",
        "description": "Nombre {freq:m} de jours à la fois chauds (température au-dessus du 75e centile) et pluvieux (précipitations au-dessus du 75e centile).",
    },
    "atmos.DAYS_OVER_PRECIP_DOY_THRESH": {
        "long_name": "Nombre de jours avec précipitations au-dessus du {pr_per_thresh}e centile journalier",
        "title": "Jours de précipitations supérieures au centile journalier",
        "description": "Nombre {freq:m} de jours avec des précipitations au-dessus du {pr_per_thresh}e centile journalier ; seuls les jours avec au moins {thresh} sont comptés.",
    },
    "atmos.DAYS_OVER_PRECIP_THRESH": {
        "long_name": "Nombre de jours avec précipitations au-dessus du {pr_per_thresh}e centile de {pr_per_period}",
        "title": "Jours de précipitations supérieures à un centile donné",
        "description": "Nombre {freq:m} de jours avec des précipitations au-dessus d'un seuil en centile.",
    },
    "atmos.FRACTION_OVER_PRECIP_DOY_THRESH": {
        "long_name": "Fraction des précipitations due aux jours dépassant le {pr_per_thresh}e centile journalier",
        "title": "Fraction des précipitations due aux jours dépassant le centile journalier",
        "description": "Fraction {freq:f} des précipitations totales due aux jours dont les précipitations dépassent le {pr_per_thresh}e centile journalier.",
    },
    "atmos.FRACTION_OVER_PRECIP_THRESH": {
        "long_name": "Fraction des précipitations due aux jours dépassant un seuil en centile",
        "title": "Fraction des précipitations due aux jours de fortes précipitations",
        "description": "Fraction {freq:f} des précipitations totales due aux jours dont les précipitations dépassent un seuil en centile.",
    },
    "atmos.DRY_SPELL_FREQUENCY": {
        "long_name": "Nombre de périodes sèches de {window} jour(s) ou plus",
        "title": "Fréquence des périodes sèches",
        "description": "Nombre {freq:m} de périodes sèches de {window} jour(s) ou plus, pendant lesquelles les précipitations accumulées sur une fenêtre de {window} jour(s) restent sous {thresh}.",
    },
    "atmos.DRY_SPELL_MAX_LENGTH": {
        "long_name": "Durée maximale des périodes sèches",
        "title": "Plus longue période sèche",
        "description": "Durée maximale {freq:f} des périodes sèches.",
    },
    "atmos.DRY_SPELL_TOTAL_LENGTH": {
        "long_name": "Nombre de jours dans les périodes sèches de {window} jour(s) ou plus",
        "title": "Durée totale des périodes sèches",
        "description": "Nombre total {freq:m} de jours appartenant à des périodes sèches de {window} jour(s) ou plus.",
    },
    "atmos.WET_SPELL_FREQUENCY": {
        "long_name": "Nombre de périodes pluvieuses de {window} jour(s) ou plus",
        "title": "Fréquence des périodes pluvieuses",
        "description": "Nombre {freq:m} de périodes pluvieuses de {window} jour(s) ou plus.",
    },
    "atmos.WET_SPELL_MAX_LENGTH": {
        "long_name": "Durée maximale des périodes pluvieuses",
        "title": "Plus longue période pluvieuse",
        "description": "Durée maximale {freq:f} des périodes pluvieuses.",
    },
    "atmos.WET_SPELL_TOTAL_LENGTH": {
        "long_name": "Nombre de jours dans les périodes pluvieuses de {window} jour(s) ou plus",
        "title": "Durée totale des périodes pluvieuses",
        "description": "Nombre total {freq:m} de jours appartenant à des périodes pluvieuses de {window} jour(s) ou plus.",
    },
    "atmos.MAX_N_DAY_PRECIPITATION_AMOUNT": {
        "long_name": "Maximum des précipitations cumulées sur {window} jours",
        "title": "Précipitations maximales sur n jours",
        "description": "Maximum {freq:m} des précipitations totales cumulées sur une fenêtre de {window} jours.",
    },
    "atmos.MAX_PR_INTENSITY": {
        "long_name": "Intensité maximale des précipitations sur une fenêtre de {window} heures",
        "title": "Intensité maximale des précipitations",
        "description": "Maximum {freq:m} de l'intensité des précipitations sur une fenêtre mobile de {window} heures.",
    },
    "atmos.HIGH_PRECIP_LOW_TEMP": {
        "long_name": "Nombre de jours avec précipitations d'au moins {pr_thresh} et température sous {tas_thresh}",
        "title": "Jours de précipitations par temps froid",
        "description": "Nombre {freq:m} de jours avec des précipitations d'au moins {pr_thresh} et une température sous {tas_thresh}.",
    },
    "atmos.RAIN_FRZGR": {
        "long_name": "Nombre de jours de pluie sur sol gelé",
        "title": "Jours de pluie sur sol gelé",
        "description": "Nombre {freq:m} de jours avec de la pluie au-dessus de {thresh} après une séquence de sept jours avec une température moyenne quotidienne sous 0 °C.",
    },
    "atmos.RAIN_SEASON": {
        "long_name": "Jour de l'année du début de la saison des pluies",
        "title": "Saison des pluies",
        "description": "Début, fin et durée de la saison des pluies, déterminés par des critères de précipitations cumulées et de séquences sèches.",
    },
    "atmos.RPRCTOT": {
        "long_name": "Proportion des précipitations accumulées d'origine convective",
        "title": "Proportion des précipitations d'origine convective",
        "description": "Proportion {freq:f} des précipitations totales due aux précipitations convectives, pour les jours dont les précipitations totales sont d'au moins {thresh}.",
    },
    "atmos.WET_PRCPTOT": {
        "long_name": "Précipitations totales accumulées les jours pluvieux",
        "title": "Précipitations accumulées les jours pluvieux",
        "description": "Précipitations totales {freq:fpl} les jours pluvieux (précipitations d'au moins {thresh}).",
    },
    "atmos.WETDAYS_PROP": {
        "long_name": "Proportion de jours avec précipitations d'au moins {thresh}",
        "title": "Proportion de jours pluvieux",
        "description": "Proportion {freq:f} de jours avec des précipitations d'au moins {thresh}.",
    },
    "atmos.PRCPAVG": {
        "long_name": "Précipitations quotidiennes moyennes",
        "title": "Précipitations quotidiennes moyennes",
        "description": "Moyenne {freq:f} des précipitations quotidiennes.",
    },
    "atmos.LIQUIDPRCPAVG": {
        "long_name": "Précipitations liquides quotidiennes moyennes (température au-dessus de {thresh})",
        "title": "Précipitations liquides moyennes",
        "description": "Moyenne {freq:f} des précipitations liquides, estimées comme les précipitations des jours où la température dépasse {thresh}.",
    },
    "atmos.LIQUIDPRCPTOT": {
        "long_name": "Précipitations liquides totales accumulées",
        "title": "Précipitations liquides accumulées",
        "description": "Précipitations liquides totales {freq:fpl} (température au-dessus de {thresh}).",
    },
    "atmos.SOLIDPRCPAVG": {
        "long_name": "Précipitations solides quotidiennes moyennes (température inférieure ou égale à {thresh})",
        "title": "Précipitations solides moyennes",
        "description": "Moyenne {freq:f} des précipitations solides, estimées comme les précipitations des jours où la température est inférieure ou égale à {thresh}.",
    },
    "atmos.SOLIDPRCPTOT": {
        "long_name": "Précipitations solides totales accumulées",
        "title": "Précipitations solides accumulées",
        "description": "Précipitations solides totales {freq:fpl} (température inférieure ou égale à {thresh}).",
    },
    "atmos.LIQUID_PRECIP_RATIO": {
        "long_name": "Fraction liquide des précipitations totales (température au-dessus de {thresh})",
        "title": "Fraction liquide des précipitations",
        "description": "Rapport {freq:m} des précipitations liquides (température au-dessus de {thresh}) aux précipitations totales.",
    },
    "atmos.PRLP": {
        "long_name": "Précipitations liquides",
        "title": "Approximation de la pluie",
        "description": "Précipitations liquides estimées à partir des précipitations totales et de la température (méthode {method}, seuil {thresh}).",
    },
    "atmos.PRSN": {
        "long_name": "Précipitations solides",
        "title": "Approximation des chutes de neige",
        "description": "Précipitations solides estimées à partir des précipitations totales et de la température (méthode {method}, seuil {thresh}).",
    },
    "atmos.WATER_BUDGET": {
        "long_name": "Bilan hydrique",
        "title": "Bilan hydrique",
        "description": "Précipitations moins l'évapotranspiration potentielle.",
    },
    "atmos.WATER_BUDGET_FROM_TAS": {
        "long_name": "Bilan hydrique (méthode {method})",
        "title": "Bilan hydrique à partir de la température",
        "description": "Précipitations moins l'évapotranspiration potentielle estimée à partir de la température (méthode {method}).",
    },
    "atmos.WATER_CYCLE_INTENSITY": {
        "long_name": "Intensité du cycle de l'eau",
        "title": "Intensité du cycle de l'eau",
        "description": "Somme {freq:f} des précipitations et de l'évapotranspiration réelle.",
    },
    "atmos.API": {
        "long_name": "Indice de précipitations antérieures",
        "title": "Indice de précipitations antérieures",
        "description": "Somme pondérée des précipitations quotidiennes sur une fenêtre de {window} jours (poids {p_exp} par jour d'ancienneté).",
    },
    "atmos.ARIDITY_INDEX": {
        "long_name": "Indice d'aridité",
        "title": "Indice d'aridité",
        "description": "Rapport des précipitations à l'évapotranspiration potentielle.",
    },
    "atmos.SPI": {
        "long_name": "Indice de précipitations normalisé (SPI)",
        "title": "Indice de précipitations normalisé",
        "description": "Précipitations cumulées sur une fenêtre mobile de {window}, normalisées de sorte que le SPI soit de moyenne nulle sur la période d'étalonnage.",
    },
    "atmos.SPEI": {
        "long_name": "Indice normalisé de précipitations et d'évapotranspiration (SPEI)",
        "title": "Indice normalisé de précipitations et d'évapotranspiration",
        "description": "Bilan hydrique (précipitations moins évapotranspiration) cumulé sur une fenêtre mobile de {window}, normalisé de sorte que le SPEI soit de moyenne nulle sur la période d'étalonnage.",
    },
    # ------------------------------------------------------------------
    # neige
    # ------------------------------------------------------------------
    "atmos.DAYS_WITH_SNOW": {
        "long_name": "Nombre de jours avec chutes de neige entre {low} et {high}",
        "title": "Jours de chutes de neige",
        "description": "Nombre {freq:m} de jours avec des chutes de neige supérieures à {low} et d'au plus {high}.",
    },
    "atmos.FIRST_SNOWFALL": {
        "long_name": "Jour de l'année des premières chutes de neige d'au moins {thresh}",
        "title": "Premières chutes de neige",
        "description": "Premier jour de l'année avec des chutes de neige d'au moins {thresh}.",
    },
    "atmos.LAST_SNOWFALL": {
        "long_name": "Jour de l'année des dernières chutes de neige d'au moins {thresh}",
        "title": "Dernières chutes de neige",
        "description": "Dernier jour de l'année avec des chutes de neige d'au moins {thresh}.",
    },
    "atmos.SNOWFALL_FREQUENCY": {
        "long_name": "Pourcentage de jours avec chutes de neige d'au moins {thresh}",
        "title": "Fréquence des chutes de neige",
        "description": "Pourcentage {freq:m} de jours avec des chutes de neige d'au moins {thresh}.",
    },
    "atmos.SNOWFALL_INTENSITY": {
        "long_name": "Chutes de neige quotidiennes moyennes les jours de chutes de neige d'au moins {thresh}",
        "title": "Intensité des chutes de neige",
        "description": "Moyenne {freq:f} des chutes de neige quotidiennes (en équivalent en eau) les jours de chutes de neige d'au moins {thresh}.",
    },
    "atmos.SND_TO_SNW": {
        "long_name": "Quantité de neige au sol",
        "title": "Quantité de neige à partir de l'épaisseur",
        "description": "Quantité de neige calculée à partir de l'épaisseur de neige et de sa masse volumique.",
    },
    "atmos.SNW_TO_SND": {
        "long_name": "Épaisseur de neige au sol",
        "title": "Épaisseur de neige à partir de la quantité",
        "description": "Épaisseur de neige calculée à partir de la quantité de neige et de sa masse volumique.",
    },
    # ------------------------------------------------------------------
    # vent
    # ------------------------------------------------------------------
    "atmos.CALM_DAYS": {
        "long_name": "Nombre de jours avec vitesse du vent en surface sous {thresh}",
        "title": "Jours calmes",
        "description": "Nombre {freq:m} de jours où la vitesse du vent en surface est sous {thresh}.",
    },
    "atmos.WINDY_DAYS": {
        "long_name": "Nombre de jours avec vitesse du vent en surface d'au moins {thresh}",
        "title": "Jours venteux",
        "description": "Nombre {freq:m} de jours où la vitesse du vent en surface est d'au moins {thresh}.",
    },
    "atmos.SFCWIND_MAX": {
        "long_name": "Maximum de la vitesse moyenne quotidienne du vent",
        "title": "Maximum de la vitesse moyenne du vent",
        "description": "Maximum {freq:m} de la vitesse moyenne quotidienne du vent en surface.",
    },
    "atmos.SFCWIND_MEAN": {
        "long_name": "Moyenne de la vitesse moyenne quotidienne du vent",
        "title": "Vitesse moyenne du vent en surface",
        "description": "Moyenne {freq:f} de la vitesse moyenne quotidienne du vent en surface.",
    },
    "atmos.SFCWIND_MIN": {
        "long_name": "Minimum de la vitesse moyenne quotidienne du vent",
        "title": "Minimum de la vitesse moyenne du vent",
        "description": "Minimum {freq:m} de la vitesse moyenne quotidienne du vent en surface.",
    },
    "atmos.SFCWINDMAX_MAX": {
        "long_name": "Maximum de la vitesse maximale quotidienne du vent",
        "title": "Maximum de la vitesse maximale du vent",
        "description": "Maximum {freq:m} de la vitesse maximale quotidienne du vent en surface.",
    },
    "atmos.SFCWINDMAX_MEAN": {
        "long_name": "Moyenne de la vitesse maximale quotidienne du vent",
        "title": "Moyenne de la vitesse maximale du vent",
        "description": "Moyenne {freq:f} de la vitesse maximale quotidienne du vent en surface.",
    },
    "atmos.SFCWINDMAX_MIN": {
        "long_name": "Minimum de la vitesse maximale quotidienne du vent",
        "title": "Minimum de la vitesse maximale du vent",
        "description": "Minimum {freq:m} de la vitesse maximale quotidienne du vent en surface.",
    },
    "atmos.WIND_CHILL": {
        "long_name": "Indice de refroidissement éolien",
        "title": "Refroidissement éolien",
        "description": "Indice de refroidissement éolien (méthode {method}).",
    },
    "atmos.WIND_POWER_POTENTIAL": {
        "long_name": "Potentiel de production éolienne",
        "title": "Potentiel de production éolienne",
        "description": "Fraction de la puissance nominale d'une éolienne pouvant être produite selon la vitesse du vent.",
    },
    "atmos.WIND_PROFILE": {
        "long_name": "Vitesse du vent à la hauteur {h}",
        "title": "Profil vertical du vent",
        "description": "Vitesse du vent à la hauteur {h}, calculée à partir de la vitesse à {h_r} par la loi de puissance.",
    },
    "atmos.WIND_SPEED_FROM_VECTOR": {
        "long_name": "Vitesse du vent en surface",
        "title": "Vitesse et direction du vent à partir de ses composantes",
        "description": "Vitesse et direction du vent calculées à partir des composantes zonale et méridienne.",
    },
    "atmos.WIND_VECTOR_FROM_SPEED": {
        "long_name": "Composantes du vent en surface",
        "title": "Composantes du vent à partir de la vitesse et de la direction",
        "description": "Composantes zonale et méridienne du vent calculées à partir de la vitesse et de la direction.",
    },
    "atmos.JETSTREAM_METRIC_WOOLLINGS": {
        "long_name": "Latitude et intensité du maximum du vent zonal lissé",
        "title": "Intensité et latitude du courant-jet",
        "description": "Latitude et intensité quotidiennes du maximum du vent zonal lissé par un filtre de Lanczos (méthode de Woollings et al.).",
    },
    # ------------------------------------------------------------------
    # humidité, rayonnement et confort thermique
    # ------------------------------------------------------------------
    "atmos.HEAT_INDEX": {
        "long_name": "Indice de chaleur",
        "title": "Indice de chaleur",
        "description": "Température ressentie compte tenu de l'humidité relative.",
    },
    "atmos.HUMIDEX": {
        "long_name": "Indice humidex",
        "title": "Humidex",
        "description": "Température ressentie par une personne moyenne compte tenu de l'humidité relative.",
    },
    "atmos.UTCI": {
        "long_name": "Indice universel de climat thermique",
        "title": "Indice universel de climat thermique",
        "description": "Température équivalente UTCI des conditions thermiques ressenties par le corps humain.",
    },
    "atmos.HURS": {
        "long_name": "Humidité relative",
        "title": "Humidité relative",
        "description": "Humidité relative calculée à partir de la température, de l'humidité spécifique et de la pression (méthode {method}).",
    },
    "atmos.HURS_FROMDEWPOINT": {
        "long_name": "Humidité relative",
        "title": "Humidité relative à partir du point de rosée",
        "description": "Humidité relative calculée à partir de la température et de la température du point de rosée.",
    },
    "atmos.HUSS": {
        "long_name": "Humidité spécifique",
        "title": "Humidité spécifique",
        "description": "Humidité spécifique calculée à partir de la température, de l'humidité relative et de la pression.",
    },
    "atmos.HUSS_FROMDEWPOINT": {
        "long_name": "Humidité spécifique",
        "title": "Humidité spécifique à partir du point de rosée",
        "description": "Humidité spécifique calculée à partir de la température du point de rosée et de la pression.",
    },
    "atmos.TDPS_FROM_HUSS": {
        "long_name": "Température du point de rosée",
        "title": "Point de rosée à partir de l'humidité spécifique",
        "description": "Température du point de rosée calculée à partir de l'humidité spécifique et de la pression (méthode {method}).",
    },
    "atmos.E_SAT": {
        "long_name": "Pression de vapeur saturante",
        "title": "Pression de vapeur saturante",
        "description": "Pression de vapeur saturante calculée à partir de la température (méthode {method}).",
    },
    "atmos.VAPOR_PRESSURE": {
        "long_name": "Pression partielle de vapeur d'eau",
        "title": "Pression de vapeur",
        "description": "Pression partielle de vapeur d'eau calculée à partir de l'humidité spécifique et de la pression.",
    },
    "atmos.VAPOR_PRESSURE_DEFICIT": {
        "long_name": "Déficit de pression de vapeur",
        "title": "Déficit de pression de vapeur",
        "description": "Écart entre la pression de vapeur saturante et la pression de vapeur réelle (méthode {method}).",
    },
    "atmos.MEAN_RADIANT_TEMPERATURE": {
        "long_name": "Température radiante moyenne",
        "title": "Température radiante moyenne",
        "description": "Température radiante moyenne calculée à partir des flux radiatifs ({stat}).",
    },
    "atmos.LONGWAVE_UPWELLING_RADIATION_FROM_NET_DOWNWELLING": {
        "long_name": "Rayonnement de grandes longueurs d'onde montant",
        "title": "Rayonnement de grandes longueurs d'onde montant",
        "description": "Rayonnement de grandes longueurs d'onde montant, calculé à partir des flux net et descendant.",
    },
    "atmos.SHORTWAVE_UPWELLING_RADIATION_FROM_NET_DOWNWELLING": {
        "long_name": "Rayonnement de courtes longueurs d'onde montant",
        "title": "Rayonnement de courtes longueurs d'onde montant",
        "description": "Rayonnement de courtes longueurs d'onde montant, calculé à partir des flux net et descendant.",
    },
    "atmos.CLEARNESS_INDEX": {
        "long_name": "Indice de clarté",
        "title": "Indice de clarté",
        "description": "Rapport du rayonnement de courtes longueurs d'onde descendant au rayonnement extraterrestre.",
    },
    "atmos.POTENTIAL_EVAPOTRANSPIRATION": {
        "long_name": "Évapotranspiration potentielle",
        "title": "Évapotranspiration potentielle",
        "description": "Évapotranspiration potentielle (méthode {method}).",
    },
    # ------------------------------------------------------------------
    # feux de forêt
    # ------------------------------------------------------------------
    "atmos.CFFWIS": {
        "long_name": "Indices de la Méthode canadienne de l'indice forêt-météo",
        "title": "Méthode canadienne de l'indice forêt-météo (IFM)",
        "description": "Indices de la Méthode canadienne de l'indice forêt-météo : DC, DMC, FFMC, ISI, BUI et FWI.",
    },
    "atmos.DC": {
        "long_name": "Indice de sécheresse",
        "title": "Indice de sécheresse (IFM)",
        "description": "Code numérique estimant la teneur en eau moyenne des couches organiques profondes et compactes (Méthode canadienne de l'indice forêt-météo).",
    },
    "atmos.DMC": {
        "long_name": "Indice de l'humus",
        "title": "Indice de l'humus (IFM)",
        "description": "Code numérique estimant la teneur en eau moyenne des couches organiques peu compactes de profondeur moyenne (Méthode canadienne de l'indice forêt-météo).",
    },
    "atmos.DF": {
        "long_name": "Facteur de sécheresse de Griffiths",
        "title": "Facteur de sécheresse de Griffiths",
        "description": "Indicateur numérique de la disponibilité du combustible forestier dans la litière profonde (méthode de Griffiths).",
    },
    "atmos.FFDI": {
        "long_name": "Indice de danger de feu de forêt de McArthur (Mark 5)",
        "title": "Indice de danger de feu de forêt de McArthur",
        "description": "Cote numérique du danger potentiel de feu de forêt (McArthur, version Mark 5).",
    },
    "atmos.KBDI": {
        "long_name": "Indice de sécheresse de Keetch-Byram",
        "title": "Indice de sécheresse de Keetch-Byram",
        "description": "Quantité d'eau nécessaire pour ramener l'humidité du sol à la capacité au champ.",
    },
    "atmos.FIRE_SEASON": {
        "long_name": "Masque de la saison des feux",
        "title": "Masque de la saison des feux",
        "description": "Masque de la saison des feux, calculé selon la méthode {method}.",
    },
    # ------------------------------------------------------------------
    # ANUCLIM (P1-P19)
    # ------------------------------------------------------------------
    "atmos.P1_ANNMEANTEMP": {
        "long_name": "Température moyenne annuelle",
        "title": "Température moyenne annuelle (P1)",
        "description": "Moyenne annuelle de la température moyenne quotidienne.",
    },
    "atmos.P2_MEANDIURNALRANGE": {
        "long_name": "Amplitude thermique diurne moyenne",
        "title": "Amplitude thermique diurne moyenne (P2)",
        "description": "Moyenne annuelle de l'amplitude thermique diurne.",
    },
    "atmos.P3_ISOTHERMALITY": {
        "long_name": "Isothermalité",
        "title": "Isothermalité (P3)",
        "description": "Rapport de l'amplitude thermique diurne moyenne à l'amplitude thermique annuelle, en pourcentage.",
    },
    "atmos.P4_TEMPSEASONALITY": {
        "long_name": "Saisonnalité de la température (coefficient de variation)",
        "title": "Saisonnalité de la température (P4)",
        "description": "Coefficient de variation de la température quotidienne, en pourcentage de sa moyenne en kelvins.",
    },
    "atmos.P5_MAXTEMPWARMESTPERIOD": {
        "long_name": "Température maximale de la période la plus chaude",
        "title": "Température maximale de la période la plus chaude (P5)",
        "description": "Maximum de la température maximale hebdomadaire ou mensuelle.",
    },
    "atmos.P6_MINTEMPCOLDESTPERIOD": {
        "long_name": "Température minimale de la période la plus froide",
        "title": "Température minimale de la période la plus froide (P6)",
        "description": "Minimum de la température minimale hebdomadaire ou mensuelle.",
    },
    "atmos.P7_TEMPANNUALRANGE": {
        "long_name": "Amplitude thermique annuelle",
        "title": "Amplitude thermique annuelle (P7)",
        "description": "Écart entre la température maximale de la période la plus chaude et la température minimale de la période la plus froide.",
    },
    "atmos.P8_MEANTEMPWETTESTQUARTER": {
        "long_name": "Température moyenne du trimestre le plus pluvieux",
        "title": "Température moyenne du trimestre le plus pluvieux (P8)",
        "description": "Température moyenne du trimestre le plus pluvieux de l'année.",
    },
    "atmos.P9_MEANTEMPDRIESTQUARTER": {
        "long_name": "Température moyenne du trimestre le plus sec",
        "title": "Température moyenne du trimestre le plus sec (P9)",
        "description": "Température moyenne du trimestre le plus sec de l'année.",
    },
    "atmos.P10_MEANTEMPWARMESTQUARTER": {
        "long_name": "Température moyenne du trimestre le plus chaud",
        "title": "Température moyenne du trimestre le plus chaud (P10)",
        "description": "Température moyenne du trimestre le plus chaud de l'année.",
    },
    "atmos.P11_MEANTEMPCOLDESTQUARTER": {
        "long_name": "Température moyenne du trimestre le plus froid",
        "title": "Température moyenne du trimestre le plus froid (P11)",
        "description": "Température moyenne du trimestre le plus froid de l'année.",
    },
    "atmos.P12_ANNUALPRECIP": {
        "long_name": "Précipitations annuelles",
        "title": "Précipitations annuelles (P12)",
        "description": "Précipitations totales accumulées sur l'année.",
    },
    "atmos.P13_PRECIPWETTESTPERIOD": {
        "long_name": "Précipitations de la période la plus pluvieuse",
        "title": "Précipitations de la période la plus pluvieuse (P13)",
        "description": "Précipitations de la période (semaine ou mois) la plus pluvieuse de l'année.",
    },
    "atmos.P14_PRECIPDRIESTPERIOD": {
        "long_name": "Précipitations de la période la plus sèche",
        "title": "Précipitations de la période la plus sèche (P14)",
        "description": "Précipitations de la période (semaine ou mois) la plus sèche de l'année.",
    },
    "atmos.P15_PRECIPSEASONALITY": {
        "long_name": "Saisonnalité des précipitations (coefficient de variation)",
        "title": "Saisonnalité des précipitations (P15)",
        "description": "Coefficient de variation des précipitations hebdomadaires ou mensuelles, en pourcentage.",
    },
    "atmos.P16_PRECIPWETTESTQUARTER": {
        "long_name": "Précipitations du trimestre le plus pluvieux",
        "title": "Précipitations du trimestre le plus pluvieux (P16)",
        "description": "Précipitations totales du trimestre le plus pluvieux de l'année.",
    },
    "atmos.P17_PRECIPDRIESTQUARTER": {
        "long_name": "Précipitations du trimestre le plus sec",
        "title": "Précipitations du trimestre le plus sec (P17)",
        "description": "Précipitations totales du trimestre le plus sec de l'année.",
    },
    "atmos.P18_PRECIPWARMESTQUARTER": {
        "long_name": "Précipitations du trimestre le plus chaud",
        "title": "Précipitations du trimestre le plus chaud (P18)",
        "description": "Précipitations totales du trimestre le plus chaud de l'année.",
    },
    "atmos.P19_PRECIPCOLDESTQUARTER": {
        "long_name": "Précipitations du trimestre le plus froid",
        "title": "Précipitations du trimestre le plus froid (P19)",
        "description": "Précipitations totales du trimestre le plus froid de l'année.",
    },
    # ------------------------------------------------------------------
    # generic / land / seaIce
    # ------------------------------------------------------------------
    "generic.FIT": {
        "long_name": "Paramètres de la distribution {dist}",
        "title": "Paramètres de distribution ajustés le long du temps",
        "description": "Paramètres de la distribution {dist} ajustés le long de la dimension temporelle.",
    },
    "generic.STATS": {
        "long_name": "{op} {freq:m} des valeurs quotidiennes",
        "title": "Statistique des valeurs quotidiennes pour une période donnée",
        "description": "{op} {freq:m} des valeurs quotidiennes.",
    },
    "generic.RETURN_LEVEL": {
        "long_name": "Niveau de retour ({mode}) pour des périodes de retour de {t} ans",
        "title": "Niveau de retour issu de l'analyse fréquentielle",
        "description": "Niveaux de retour des extrêmes de bloc ({mode}) pour des périodes de retour de {t} ans, selon un ajustement {dist}.",
    },
    "land.BASE_FLOW_INDEX_SEASONAL_RATIO": {
        "long_name": "Indice de débit de base par saison",
        "title": "Indice saisonnier de débit de base et rapport hiver/été",
        "description": "Indice de débit de base calculé par saison, avec le rapport des valeurs d'hiver et d'été.",
    },
    "land.BLOWING_SNOW": {
        "long_name": "Nombre de jours avec chutes de neige récentes et vent forts",
        "title": "Jours de poudrerie",
        "description": "Nombre {freq:m} de jours où les chutes de neige cumulées des {window} derniers jours dépassent {snd_thresh} et où la vitesse du vent dépasse {sfcWind_thresh}.",
    },
    "land.DOY_QMAX": {
        "long_name": "Jour de l'année du débit maximal",
        "title": "Jour de l'année du débit maximal",
        "description": "Jour de l'année où le débit atteint son maximum sur la période.",
    },
    "land.DOY_QMIN": {
        "long_name": "Jour de l'année du débit minimal",
        "title": "Jour de l'année du débit minimal",
        "description": "Jour de l'année où le débit atteint son minimum sur la période.",
    },
    "land.FLOW_INDEX": {
        "long_name": "Indice de débit",
        "title": "Indice de débit",
        "description": "{p}e centile du débit normalisé par le débit médian.",
    },
    "land.HIGH_FLOW_FREQUENCY": {
        "long_name": "Fréquence des hauts débits",
        "title": "Fréquence des hauts débits",
        "description": "Fréquence {freq:f} des débits supérieurs à {threshold_factor} fois le débit médian.",
    },
    "land.LOW_FLOW_FREQUENCY": {
        "long_name": "Fréquence des bas débits",
        "title": "Fréquence des bas débits",
        "description": "Fréquence {freq:f} des débits inférieurs à {threshold_factor} fois le débit moyen.",
    },
    "land.HOLIDAY_SNOW_AND_SNOWFALL_DAYS": {
        "long_name": "Nombre de jours fériés avec neige au sol et chutes de neige",
        "title": "Noëls blancs parfaits",
        "description": "Nombre de jours fériés (entre le {date_start} et le {date_end}) avec une épaisseur de neige {snd_op} {snd_thresh} et des chutes de neige {prsn_op} {prsn_thresh}.",
    },
    "land.HOLIDAY_SNOW_DAYS": {
        "long_name": "Nombre de jours fériés avec neige au sol",
        "title": "Noëls blancs",
        "description": "Nombre de jours fériés (entre le {date_start} et le {date_end}) avec une épaisseur de neige {snd_op} {snd_thresh}.",
    },
    "land.LAG_SNOWPACK_FLOW_PEAKS": {
        "long_name": "Délai entre l'enneigement maximal et les hauts débits",
        "title": "Délai entre l'enneigement maximal et les hauts débits",
        "description": "Nombre {freq:m} de jours entre le maximum de la quantité de neige et la date moyenne des débits dépassant le quantile {p}.",
    },
    "land.MELT_AND_PRECIP_MAX": {
        "long_name": "Maximum de la fonte de neige et des précipitations combinées sur une fenêtre de {window} jours",
        "title": "Maximum de fonte et de précipitations",
        "description": "Maximum {freq:m} de la somme de la fonte de neige (en équivalent en eau) et des précipitations sur une fenêtre de {window} jours.",
    },
    "land.RB_FLASHINESS_INDEX": {
        "long_name": "Indice d'impulsivité de Richards-Baker",
        "title": "Indice d'impulsivité de Richards-Baker",
        "description": "Indice {freq:m} de Richards-Baker, mesurant l'impulsivité du débit.",
    },
    "land.RUNOFF_RATIO": {
        "long_name": "Rapport du débit aux précipitations",
        "title": "Coefficient d'écoulement",
        "description": "Rapport {freq:m} du volume de débit accumulé aux précipitations accumulées sur le bassin versant.",
    },
    "land.SEN_SLOPE": {
        "long_name": "Pente de Theil-Sen",
        "title": "Pente de Sen et test de tendance de Mann-Kendall",
        "description": "Estimation robuste de la pente de tendance (Theil-Sen) accompagnée du test de Mann-Kendall.",
    },
    "land.SGI": {
        "long_name": "Indice piézométrique normalisé (SGI)",
        "title": "Indice piézométrique normalisé",
        "description": "Niveau de la nappe cumulé sur une fenêtre mobile de {window}, normalisé de sorte que le SGI soit de moyenne nulle sur la période d'étalonnage.",
    },
    "land.SSI": {
        "long_name": "Indice de débit normalisé (SSI)",
        "title": "Indice de débit normalisé",
        "description": "Débit cumulé sur une fenêtre mobile de {window}, normalisé de sorte que le SSI soit de moyenne nulle sur la période d'étalonnage.",
    },
    "land.SND_DAYS_ABOVE": {
        "long_name": "Nombre de jours avec épaisseur de neige d'au moins {thresh}",
        "title": "Jours avec neige au sol (épaisseur)",
        "description": "Nombre {freq:m} de jours avec une épaisseur de neige d'au moins {thresh}.",
    },
    "land.SNW_DAYS_ABOVE": {
        "long_name": "Nombre de jours avec quantité de neige d'au moins {thresh}",
        "title": "Jours avec neige au sol (quantité)",
        "description": "Nombre {freq:m} de jours avec une quantité de neige d'au moins {thresh}.",
    },
    "land.SND_MAX_DOY": {
        "long_name": "Jour de l'année où l'épaisseur de neige atteint son maximum",
        "title": "Jour de l'année de l'épaisseur de neige maximale",
        "description": "Jour de l'année où l'épaisseur de neige atteint son maximum.",
    },
    "land.SND_SEASON_END": {
        "long_name": "Fin du couvert de neige continu (épaisseur)",
        "title": "Fin du couvert de neige (épaisseur)",
        "description": "Jour de l'année où l'épaisseur de neige passe sous {thresh} pendant au moins {window} jours.",
    },
    "land.SND_SEASON_LENGTH": {
        "long_name": "Durée du couvert de neige (épaisseur)",
        "title": "Durée du couvert de neige (épaisseur)",
        "description": "Durée de la saison d'enneigement : elle commence par au moins {window} jours avec une épaisseur de neige au-dessus de {thresh} et se termine par au moins {window} jours avec une épaisseur sous {thresh}.",
    },
    "land.SND_SEASON_START": {
        "long_name": "Début du couvert de neige continu (épaisseur)",
        "title": "Début du couvert de neige (épaisseur)",
        "description": "Jour de l'année où l'épaisseur de neige dépasse {thresh} pendant au moins {window} jours.",
    },
    "land.SND_STORM_DAYS": {
        "long_name": "Nombre de jours de tempête de neige (accumulation en épaisseur d'au moins {thresh})",
        "title": "Jours de tempête hivernale (épaisseur)",
        "description": "Nombre {freq:m} de jours où l'accumulation de neige dépasse {thresh}.",
    },
    "land.SNW_SEASON_END": {
        "long_name": "Fin du couvert de neige continu (quantité)",
        "title": "Fin du couvert de neige (quantité)",
        "description": "Jour de l'année où la quantité de neige passe sous {thresh} pendant au moins {window} jours.",
    },
    "land.SNW_SEASON_LENGTH": {
        "long_name": "Durée du couvert de neige (quantité)",
        "title": "Durée du couvert de neige (quantité)",
        "description": "Durée de la saison d'enneigement, définie par une quantité de neige d'au moins {thresh}.",
    },
    "land.SNW_SEASON_START": {
        "long_name": "Début du couvert de neige continu (quantité)",
        "title": "Début du couvert de neige (quantité)",
        "description": "Jour de l'année où la quantité de neige dépasse {thresh} pendant au moins {window} jours.",
    },
    "land.SNW_STORM_DAYS": {
        "long_name": "Nombre de jours de tempête de neige (accumulation en quantité d'au moins {thresh})",
        "title": "Jours de tempête hivernale (quantité)",
        "description": "Nombre {freq:m} de jours où l'accumulation de neige dépasse {thresh}.",
    },
    "land.SNOW_DEPTH": {
        "long_name": "Moyenne de l'épaisseur de neige quotidienne",
        "title": "Épaisseur de neige moyenne",
        "description": "Moyenne {freq:f} de l'épaisseur de neige quotidienne.",
    },
    "land.SNOW_MELT_WE_MAX": {
        "long_name": "Maximum de la fonte de neige sur une fenêtre de {window} jours",
        "title": "Fonte de neige maximale",
        "description": "Maximum {freq:m} de la fonte de neige (en équivalent en eau) sur une fenêtre de {window} jours.",
    },
    "land.SNW_MAX": {
        "long_name": "Maximum de l'équivalent en eau de la neige",
        "title": "Quantité de neige maximale",
        "description": "Maximum {freq:m} de l'équivalent en eau de la neige au sol.",
    },
    "land.SNW_MAX_DOY": {
        "long_name": "Jour de l'année où l'équivalent en eau de la neige atteint son maximum",
        "title": "Jour de l'année de la quantité de neige maximale",
        "description": "Jour de l'année où l'équivalent en eau de la neige atteint son maximum.",
    },
    "land.BASE_FLOW_INDEX": {
        "long_name": "Indice de débit de base",
        "title": "Indice de débit de base",
        "description": "Minimum de la moyenne mobile sur 7 jours du débit, divisé par le débit moyen.",
    },
    "seaIce.SEA_ICE_AREA": {
        "long_name": "Somme des superficies couvertes de glace où la concentration de glace de mer est d'au moins {thresh}",
        "title": "Superficie de glace de mer",
        "description": "Somme des superficies couvertes de glace où la concentration de glace de mer est d'au moins {thresh}.",
    },
    # ------------------------------------------------------------------
    # divers
    # ------------------------------------------------------------------
    "atmos.PP": {
        "long_name": "Moyenne de la pression quotidienne au niveau de la mer",
        "title": "Pression moyenne au niveau de la mer",
        "description": "Moyenne {freq:f} de la pression quotidienne au niveau de la mer.",
    },
    "atmos.RH": {
        "long_name": "Moyenne de l'humidité relative quotidienne",
        "title": "Humidité relative moyenne",
        "description": "Moyenne {freq:f} de l'humidité relative quotidienne.",
    },
    "atmos.SS": {
        "long_name": "Durée d'ensoleillement",
        "title": "Durée d'ensoleillement",
        "description": "Somme {freq:f} de la durée d'ensoleillement quotidienne.",
    },
    "atmos.FG": {
        "long_name": "Moyenne de la vitesse moyenne quotidienne du vent",
        "title": "Vitesse moyenne du vent",
        "description": "Moyenne {freq:f} de la vitesse moyenne quotidienne du vent.",
    },
    "atmos.FXX": {
        "long_name": "Maximum des rafales de vent maximales quotidiennes",
        "title": "Rafale de vent maximale",
        "description": "Maximum {freq:m} des rafales de vent maximales quotidiennes.",
    },
    "atmos.CTMGETT": {
        "long_name": "Durée maximale des périodes avec température moyenne supérieure ou égale à un seuil",
        "title": "Périodes avec température moyenne au-dessus du seuil (≥)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température moyenne quotidienne est supérieure ou égale à {thresh}.",
    },
    "atmos.CTMGTTT": {
        "long_name": "Durée maximale des périodes avec température moyenne supérieure à un seuil",
        "title": "Périodes avec température moyenne au-dessus du seuil (>)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température moyenne quotidienne dépasse {thresh}.",
    },
    "atmos.CTMLETT": {
        "long_name": "Durée maximale des périodes avec température moyenne inférieure ou égale à un seuil",
        "title": "Périodes avec température moyenne sous le seuil (≤)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température moyenne quotidienne est inférieure ou égale à {thresh}.",
    },
    "atmos.CTMLTTT": {
        "long_name": "Durée maximale des périodes avec température moyenne inférieure à un seuil",
        "title": "Périodes avec température moyenne sous le seuil (<)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température moyenne quotidienne est sous {thresh}.",
    },
    "atmos.CTNGETT": {
        "long_name": "Durée maximale des périodes avec température minimale supérieure ou égale à un seuil",
        "title": "Périodes avec température minimale au-dessus du seuil (≥)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température minimale quotidienne est supérieure ou égale à {thresh}.",
    },
    "atmos.CTNGTTT": {
        "long_name": "Durée maximale des périodes avec température minimale supérieure à un seuil",
        "title": "Périodes avec température minimale au-dessus du seuil (>)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température minimale quotidienne dépasse {thresh}.",
    },
    "atmos.CTNLETT": {
        "long_name": "Durée maximale des périodes avec température minimale inférieure ou égale à un seuil",
        "title": "Périodes avec température minimale sous le seuil (≤)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température minimale quotidienne est inférieure ou égale à {thresh}.",
    },
    "atmos.CTNLTTT": {
        "long_name": "Durée maximale des périodes avec température minimale inférieure à un seuil",
        "title": "Périodes avec température minimale sous le seuil (<)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.CTXGETT": {
        "long_name": "Durée maximale des périodes avec température maximale supérieure ou égale à un seuil",
        "title": "Périodes avec température maximale au-dessus du seuil (≥)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température maximale quotidienne est supérieure ou égale à {thresh}.",
    },
    "atmos.CTXGTTT": {
        "long_name": "Durée maximale des périodes avec température maximale supérieure à un seuil",
        "title": "Périodes avec température maximale au-dessus du seuil (>)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.CTXLETT": {
        "long_name": "Durée maximale des périodes avec température maximale inférieure ou égale à un seuil",
        "title": "Périodes avec température maximale sous le seuil (≤)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température maximale quotidienne est inférieure ou égale à {thresh}.",
    },
    "atmos.CTXLTTT": {
        "long_name": "Durée maximale des périodes avec température maximale inférieure à un seuil",
        "title": "Périodes avec température maximale sous le seuil (<)",
        "description": "Durée maximale {freq:f} des séquences de jours consécutifs où la température maximale quotidienne est sous {thresh}.",
    },
    # ------------------------------------------------------------------
    # round 3 : dernières entrées issues du générateur, réécrites à la main
    # ------------------------------------------------------------------
    "atmos.TG_MEAN": {
        "long_name": "Moyenne de la température moyenne quotidienne",
        "title": "Moyenne de la température moyenne quotidienne",
        "description": "Moyenne {freq:f} de la température moyenne quotidienne.",
    },
    "atmos.TG_MAX": {
        "long_name": "Maximum de la température moyenne quotidienne",
        "title": "Maximum de la température moyenne quotidienne",
        "description": "Maximum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TG_MIN": {
        "long_name": "Minimum de la température moyenne quotidienne",
        "title": "Minimum de la température moyenne quotidienne",
        "description": "Minimum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TX_MAX": {
        "long_name": "Maximum de la température maximale quotidienne",
        "title": "Maximum de la température maximale quotidienne",
        "description": "Maximum {freq:m} de la température maximale quotidienne.",
    },
    "atmos.TX_DAYS_ABOVE": {
        "long_name": "Nombre de jours avec température maximale au-dessus de {thresh}",
        "title": "Nombre de jours avec température maximale au-dessus d'un seuil",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.FROST_DAYS": {
        "long_name": "Nombre de jours de gel (tasmin < {thresh})",
        "title": "Jours de gel",
        "description": "Nombre {freq:m} de jours où la température minimale quotidienne est sous {thresh}.",
    },
    "atmos.ICE_DAYS": {
        "long_name": "Nombre de jours sans dégel (tasmax < {thresh})",
        "title": "Jours sans dégel",
        "description": "Nombre {freq:m} de jours où la température maximale quotidienne est sous {thresh}.",
    },
    "atmos.GROWING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de croissance (seuil de {thresh})",
        "title": "Degrés-jours de croissance",
        "description": "Cumul {freq:m} des degrés-jours au-dessus de {thresh}.",
    },
    "atmos.HEATING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de chauffage (seuil de {thresh})",
        "title": "Degrés-jours de chauffage",
        "description": "Cumul {freq:m} des degrés-jours sous {thresh}.",
    },
    "atmos.COOLING_DEGREE_DAYS": {
        "long_name": "Degrés-jours de climatisation (seuil de {thresh})",
        "title": "Degrés-jours de climatisation",
        "description": "Cumul {freq:m} des degrés-jours au-dessus de {thresh}.",
    },
    "atmos.HEAT_WAVE_FREQUENCY": {
        "long_name": "Nombre de vagues de chaleur",
        "title": "Fréquence des vagues de chaleur",
        "description": "Nombre {freq:m} de vagues de chaleur : au moins {window} jours consécutifs où la température minimale quotidienne dépasse {thresh_tasmin} et la température maximale quotidienne dépasse {thresh_tasmax}.",
    },
    "atmos.HEAT_WAVE_MAX_LENGTH": {
        "long_name": "Durée maximale des vagues de chaleur",
        "title": "Durée maximale des vagues de chaleur",
        "description": "Durée {freq:f} de la plus longue vague de chaleur : au moins {window} jours consécutifs où la température minimale quotidienne dépasse {thresh_tasmin} et la température maximale quotidienne dépasse {thresh_tasmax}.",
    },
    "atmos.HOT_SPELL_FREQUENCY": {
        "long_name": "Nombre de périodes chaudes",
        "title": "Fréquence des périodes chaudes",
        "description": "Nombre {freq:m} de périodes chaudes : au moins {window} jours consécutifs où la température maximale quotidienne dépasse {thresh}.",
    },
    "atmos.PRECIP_ACCUMULATION": {
        "long_name": "Précipitations totales",
        "title": "Précipitations accumulées",
        "description": "Cumul {freq:m} des précipitations totales.",
    },
    "atmos.WETDAYS": {
        "long_name": "Nombre de jours pluvieux (pr ≥ {thresh})",
        "title": "Jours pluvieux",
        "description": "Nombre {freq:m} de jours où les précipitations quotidiennes atteignent ou dépassent {thresh}.",
    },
    "atmos.MAXIMUM_CONSECUTIVE_DRY_DAYS": {
        "long_name": "Durée maximale d'une période sèche (pr < {thresh})",
        "title": "Durée maximale d'une période sèche",
        "description": "Nombre maximal {freq:m} de jours consécutifs où les précipitations quotidiennes sont sous {thresh}.",
    },
    "atmos.CDD": {
        "long_name": "Nombre maximal de jours secs consécutifs",
        "title": "Jours secs consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où les précipitations quotidiennes sont sous 1 mm.",
    },
    "atmos.CWD": {
        "long_name": "Nombre maximal de jours pluvieux consécutifs",
        "title": "Jours pluvieux consécutifs",
        "description": "Nombre maximal {freq:m} de jours consécutifs où les précipitations quotidiennes atteignent ou dépassent 1 mm.",
    },
    "atmos.CDDCOLDTT": {
        "long_name": "Degrés-jours de climatisation (seuil de {thresh})",
        "title": "Degrés-jours de climatisation",
        "description": "Cumul {freq:m} des degrés-jours de la température moyenne quotidienne au-dessus de {thresh}.",
    },
    "atmos.DDGTTT": {
        "long_name": "Degrés-jours au-dessus de {thresh}",
        "title": "Degrés-jours au-dessus d'un seuil",
        "description": "Cumul {freq:m} des degrés-jours de la température moyenne quotidienne au-dessus de {thresh}.",
    },
    "atmos.DDLTTT": {
        "long_name": "Degrés-jours sous {thresh}",
        "title": "Degrés-jours sous un seuil",
        "description": "Cumul {freq:m} des degrés-jours de la température moyenne quotidienne sous {thresh}.",
    },
    "atmos.GDDGROWTT": {
        "long_name": "Degrés-jours de croissance (seuil de {thresh})",
        "title": "Degrés-jours de croissance",
        "description": "Cumul {freq:m} des degrés-jours de la température moyenne quotidienne au-dessus de {thresh}.",
    },
    "atmos.HDDHEATTT": {
        "long_name": "Degrés-jours de chauffage (seuil de {thresh})",
        "title": "Degrés-jours de chauffage",
        "description": "Cumul {freq:m} des degrés-jours de la température moyenne quotidienne sous {thresh}.",
    },
    "atmos.TGMAX": {
        "long_name": "Maximum de la température moyenne quotidienne",
        "title": "Maximum de la température moyenne quotidienne",
        "description": "Maximum {freq:m} de la température moyenne quotidienne.",
    },
    "atmos.TGMIN": {
        "long_name": "Minimum de la température moyenne quotidienne",
        "title": "Minimum de la température moyenne quotidienne",
        "description": "Minimum {freq:m} de la température moyenne quotidienne.",
    },
    "seaIce.SEA_ICE_EXTENT": {
        "long_name": "Étendue de la glace de mer",
        "title": "Étendue de la glace de mer",
        "description": "Superficie totale des mailles océaniques où la concentration de glace de mer atteint ou dépasse {thresh}.",
    },
}


def main() -> None:
    path = Path(__file__).parent.parent / "xclim_tpu" / "data" / "fr.json"
    fr = json.loads(path.read_text())
    missing = [k for k in MANUAL if k not in fr]
    fr.update(MANUAL)
    path.write_text(json.dumps(fr, ensure_ascii=False, indent=2) + "\n")
    print(f"applied {len(MANUAL)} manual entries "
          f"({len(missing)} were new: {missing[:5]}...)" if missing else
          f"applied {len(MANUAL)} manual entries (all existing keys)")


if __name__ == "__main__":
    main()

