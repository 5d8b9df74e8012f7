"""Search-filter DSL (SURVEY.md F1-F4).

Plan-time expression builder with eager validation, matching the reference
``Filter`` semantics (/root/reference/icrawler/builtin/filter.py:1-27):
a rule registry of (format_fn, choices); ``apply(options, sep)`` validates
each option (list membership, or isinstance when choices is a type) and
joins the formatted fragments with ``sep``. Raises KeyError / ValueError /
TypeError exactly as the reference does (filter.py:16-25).

The per-engine rule tables reproduce the reference's query-fragment codes:
Google /root/reference/icrawler/builtin/google.py:13-129,
Bing   /root/reference/icrawler/builtin/bing.py:12-103,
Baidu  /root/reference/icrawler/builtin/baidu.py:8-67.
"""

from __future__ import annotations

import datetime


class FilterDSL:
    def __init__(self):
        self.rules: dict[str, tuple] = {}

    def add_rule(self, name, format_fn, choices=None):
        assert callable(format_fn)
        assert choices is None or isinstance(choices, (list, type))
        self.rules[name] = (format_fn, choices)

    def apply(self, options, sep="") -> str:
        if options is None:
            return ""
        assert isinstance(options, dict)
        fragments = []
        for name, val in options.items():
            if name not in self.rules:
                raise KeyError(
                    f"unsupported filter '{name}', supported filter options are "
                    + ", ".join(self.rules.keys())
                )
            format_fn, choices = self.rules[name]
            if isinstance(choices, type) and not isinstance(val, choices):
                raise TypeError(
                    f'filter option "{name}" must be a {choices.__name__}, '
                    f"not {type(val).__name__}"
                )
            if isinstance(choices, list) and val not in choices:
                raise ValueError(
                    f'filter option "{name}" must be one of the following: '
                    + ", ".join(choices)
                )
            fragments.append(format_fn(val))
        return sep.join(fragments)


# ---------------------------------------------------------------- Google

_GOOGLE_COLOR_NAMED = {"color": "color", "blackandwhite": "gray", "transparent": "trans"}
_GOOGLE_SIZE_NAMED = {"large": "l", "medium": "m", "icon": "i"}
_GOOGLE_SIZE_GT = {
    "400x300": "qsvga", "640x480": "vga", "800x600": "svga", "1024x768": "xga",
    "2mp": "2mp", "4mp": "4mp", "6mp": "6mp", "8mp": "8mp", "10mp": "10mp",
    "12mp": "12mp", "15mp": "15mp", "20mp": "20mp", "40mp": "40mp", "70mp": "70mp",
}
_GOOGLE_LICENSE = {
    "noncommercial": "f", "commercial": "fc",
    "noncommercial,modify": "fm", "commercial,modify": "fmc",
}
_GOOGLE_DATE_NAMED = {
    "anytime": "", "pastday": "qdr:d", "pastweek": "qdr:w",
    "pastmonth": "qdr:m", "pastyear": "qdr:y",
}


def _google_size(size):
    if size in _GOOGLE_SIZE_NAMED:
        return "isz:" + _GOOGLE_SIZE_NAMED[size]
    if size.startswith(">"):
        return "isz:lt,islt:" + _GOOGLE_SIZE_GT[size[1:]]
    if size.startswith("="):
        wh = size[1:].split("x")
        assert len(wh) == 2
        return f"isz:ex,iszw:{wh[0]},iszh:{wh[1]}"
    raise ValueError(
        'filter option "size" must be one of the following: '
        "large, medium, icon, >[]x[], =[]x[] ([] is an integer)"
    )


def _google_date(date):
    if date in _GOOGLE_DATE_NAMED:
        return _GOOGLE_DATE_NAMED[date]
    if isinstance(date, tuple):
        assert len(date) == 2
        parts = []
        for d in date:
            if d is None:
                parts.append("")
            elif isinstance(d, (tuple, datetime.date)):
                d = datetime.date(*d) if isinstance(d, tuple) else d
                parts.append(d.strftime("%m/%d/%Y"))
            else:
                raise TypeError("date must be a tuple or datetime.date object")
        return f"cdr:1,cd_min:{parts[0]},cd_max:{parts[1]}"
    raise TypeError('filter option "date" must be "pastday", "pastweek" or a tuple of dates')


def google_filter() -> FilterDSL:
    f = FilterDSL()
    f.add_rule(
        "type",
        lambda t: "itp:lineart" if t == "linedrawing" else "itp:" + t,
        ["photo", "face", "clipart", "linedrawing", "animated"],
    )
    f.add_rule(
        "color",
        lambda c: "ic:" + _GOOGLE_COLOR_NAMED[c] if c in _GOOGLE_COLOR_NAMED else f"ic:specific,isc:{c}",
        ["color", "blackandwhite", "transparent", "red", "orange", "yellow", "green",
         "teal", "blue", "purple", "pink", "white", "gray", "black", "brown"],
    )
    f.add_rule("size", _google_size)
    f.add_rule("license", lambda lic: "sur:" + _GOOGLE_LICENSE[lic], list(_GOOGLE_LICENSE))
    f.add_rule("date", _google_date)
    return f


# ------------------------------------------------------------------ Bing

_BING_LICENSE = {
    "creativecommons": "licenseType-Any",
    "publicdomain": "license-L1",
    "noncommercial": "license-L2_L3_L4_L5_L6_L7",
    "commercial": "license-L2_L3_L4",
    "noncommercial,modify": "license-L2_L3_L5_L6",
    "commercial,modify": "license-L2_L3",
}
_BING_DATE_MIN = {"pastday": 1440, "pastweek": 10080, "pastmonth": 43200, "pastyear": 525600}


def _bing_size(size):
    if size in ("large", "medium", "small"):
        return "+filterui:imagesize-" + size
    if size == "extralarge":
        return "+filterui:imagesize-wallpaper"
    if size.startswith(">"):
        wh = size[1:].split("x")
        assert len(wh) == 2
        return f"+filterui:imagesize-custom_{wh[0]}_{wh[1]}"
    raise ValueError(
        'filter option "size" must be one of the following: '
        "extralarge, large, medium, small, >[]x[] ([] is an integer)"
    )


def _bing_color(color):
    if color == "color":
        return "+filterui:color2-color"
    if color == "blackandwhite":
        return "+filterui:color2-bw"
    return "+filterui:color2-FGcls_" + color.upper()


def bing_filter() -> FilterDSL:
    f = FilterDSL()
    f.add_rule(
        "type",
        lambda t: "+filterui:photo-" + ("animatedgif" if t == "animated" else t),
        ["photo", "clipart", "linedrawing", "transparent", "animated"],
    )
    f.add_rule(
        "color", _bing_color,
        ["color", "blackandwhite", "red", "orange", "yellow", "green", "teal",
         "blue", "purple", "pink", "white", "gray", "black", "brown"],
    )
    f.add_rule("size", _bing_size)
    f.add_rule("license", lambda lic: "+filterui:" + _BING_LICENSE[lic], list(_BING_LICENSE))
    f.add_rule("layout", lambda x: "+filterui:aspect-" + x, ["square", "wide", "tall"])
    f.add_rule("people", lambda x: "+filterui:face-" + x, ["face", "portrait"])
    f.add_rule("date", lambda d: "+filterui:age-lt" + str(_BING_DATE_MIN[d]), list(_BING_DATE_MIN))
    return f


# ----------------------------------------------------------------- Baidu

_BAIDU_TYPE = {
    "portrait": "s=3&lm=0&st=-1&face=0",
    "face": "s=0&lm=0&st=-1&face=1",
    "clipart": "s=0&lm=0&st=1&face=0",
    "linedrawing": "s=0&lm=0&st=2&face=0",
    "animated": "s=0&lm=6&st=-1&face=0",
    "static": "s=0&lm=7&st=-1&face=0",
}
_BAIDU_COLOR = {
    "red": 1, "orange": 256, "yellow": 2, "green": 4, "purple": 32, "pink": 64,
    "teal": 8, "blue": 16, "brown": 12, "white": 1024, "black": 512, "blackandwhite": 2048,
}
_BAIDU_SIZE_NAMED = {"extralarge": 9, "large": 3, "medium": 2, "small": 1}


def _baidu_size(size):
    if size in _BAIDU_SIZE_NAMED:
        return f"z={_BAIDU_SIZE_NAMED[size]}"
    if size.startswith("="):
        wh = size[1:].split("x")
        assert len(wh) == 2
        return f"width={wh[0]}&height={wh[1]}"
    raise ValueError(
        'filter option "size" must be one of the following: '
        "extralarge, large, medium, small, >[]x[] ([] is an integer)"
    )


def baidu_filter() -> FilterDSL:
    f = FilterDSL()
    f.add_rule("type", lambda t: _BAIDU_TYPE[t], list(_BAIDU_TYPE))
    f.add_rule("color", lambda c: f"ic={_BAIDU_COLOR[c]}", list(_BAIDU_COLOR))
    f.add_rule("size", _baidu_size)
    return f
