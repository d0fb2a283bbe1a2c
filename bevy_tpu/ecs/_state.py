"""Copy-on-write helpers for the nested-dict world state pytree. Systems are
functionally pure under trace; these keep updates O(path) shallow copies."""


def set_in(d, path, value):
    if len(path) == 1:
        out = dict(d)
        out[path[0]] = value
        return out
    out = dict(d)
    out[path[0]] = set_in(d[path[0]], path[1:], value)
    return out


def update_in(d, path, fn):
    return set_in(d, path, fn(get_in(d, path)))


def get_in(d, path):
    for k in path:
        d = d[k]
    return d
