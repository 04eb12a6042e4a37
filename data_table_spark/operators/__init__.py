"""Operator modules (SURVEY.md §2 inventory).

- joins:    equi / anti / semi / mult / update-on-join / merge / CJ
- asof:     rolling (as-of) joins — roll=/rollends/nearest
- overlaps: foverlaps interval joins, inrange
- grouping: GForce aggregate surface, uniqueN, unique/duplicated,
            grouping sets, dogroups (applyInPandas)
- window:   shift, froll*, frank, rleid, rowid, nafill, cum*
- reshape:  dcast, melt, transpose, tstrsplit, rbindlist, split
- setops:   funion / fintersect / fsetdiff / fsetequal
"""
