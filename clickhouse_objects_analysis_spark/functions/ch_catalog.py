"""Public ClickHouse function-name catalog for the translation-table
audit (r6 verdict directive #6).

``CATALOG`` enumerates the function names documented in the public
ClickHouse SQL reference (docs.clickhouse.com → SQL reference →
functions / aggregate-functions / window-functions TOC), grouped by the
docs' own category pages. The audit (tools/ch_function_audit.py)
resolves every name to exactly one status:

- ``table``      — mapped in functions/ch.py CH_FUNCTIONS
- ``builtin``    — ANSI-SQL surface Spark SQL parses directly (listed
                   in BUILTIN below), no shim needed
- ``registry``   — implemented as an oracle-checked registry query /
                   operator rather than a scalar shim (evidence = the
                   implementing module, found by word-boundary search)
- ``unsupported``— deliberately out, with the reason recorded below

Mechanical name families the docs expand combinatorially (toInt8 …
toUInt256 × OrZero/OrNull/OrDefault, h3*/s2* geo indexes, …) are
recorded once in ``FAMILIES`` with an explicit status instead of being
padded out member-by-member — the gap is recorded, not silent.

This module is data, not behavior: nothing imports it at query time.
"""

from __future__ import annotations

#: docs category -> documented function names (representative-complete:
#: every name on the category page that is not part of a FAMILIES row).
CATALOG: dict[str, tuple[str, ...]] = {
    "arithmetic": (
        "plus", "minus", "multiply", "divide", "intDiv", "intDivOrZero",
        "modulo", "moduloOrZero", "positiveModulo", "negate", "abs",
        "gcd", "lcm", "max2", "min2", "byteSwap",
        "multiplyDecimal", "divideDecimal",
    ),
    "comparison": (
        "equals", "notEquals", "less", "greater", "lessOrEquals",
        "greaterOrEquals",
    ),
    "logical": ("and", "or", "not", "xor"),
    "conditional": ("if", "multiIf", "greatest", "least", "clamp"),
    "rounding": (
        "floor", "ceil", "ceiling", "round", "roundBankers", "trunc",
        "truncate", "roundToExp2", "roundDuration", "roundAge",
        "roundDown",
    ),
    "math": (
        "e", "pi", "exp", "log", "ln", "exp2", "log2", "exp10", "log10",
        "sqrt", "cbrt", "erf", "erfc", "lgamma", "tgamma", "sin", "cos",
        "tan", "asin", "acos", "atan", "atan2", "sinh", "cosh", "tanh",
        "asinh", "acosh", "atanh", "hypot", "log1p", "expm1", "pow",
        "power", "intExp2", "intExp10", "sign", "degrees", "radians",
        "factorial", "width_bucket", "proportionsZTest",
    ),
    "string": (
        "empty", "notEmpty", "length", "lengthUTF8", "lower", "upper",
        "lowerUTF8", "upperUTF8", "isValidUTF8", "toValidUTF8", "repeat",
        "reverse", "reverseUTF8", "concat", "concatAssumeInjective",
        "concatWithSeparator", "substring", "substringUTF8",
        "substringIndex", "appendTrailingCharIfAbsent", "convertCharset",
        "base58Encode", "base58Decode", "base64Encode", "base64Decode",
        "punycodeEncode", "punycodeDecode", "idnaEncode", "idnaDecode",
        "tryBase64Decode", "endsWith", "startsWith", "trimLeft",
        "trimRight", "trimBoth", "crc32", "CRC32IEEE", "CRC64",
        "normalizeQuery", "normalizedQueryHash", "normalizeUTF8NFC",
        "normalizeUTF8NFD", "normalizeUTF8NFKC", "normalizeUTF8NFKD",
        "encodeXMLComponent", "decodeXMLComponent", "extractTextFromHTML",
        "ascii", "soundex", "initcap", "initcapUTF8", "firstLine",
        "format", "leftPad", "rightPad", "leftPadUTF8", "rightPadUTF8",
        "space", "left", "right", "bar",
    ),
    "searching-strings": (
        "position", "locate", "positionCaseInsensitive", "positionUTF8",
        "positionCaseInsensitiveUTF8", "multiSearchAllPositions",
        "multiSearchFirstPosition", "multiSearchFirstIndex",
        "multiSearchAny", "match", "multiMatchAny", "multiMatchAnyIndex",
        "multiFuzzyMatchAny", "extract", "extractAll",
        "extractAllGroupsHorizontal", "extractAllGroupsVertical", "like",
        "notLike", "ilike", "notILike", "ngramDistance", "ngramSearch",
        "countSubstrings", "countMatches", "regexpExtract",
        "hasSubsequence", "hasToken",
    ),
    "replacing-strings": (
        "replaceOne", "replaceAll", "replaceRegexpOne",
        "replaceRegexpAll", "regexpQuoteMeta", "translate",
        "translateUTF8", "overlay",
    ),
    "string-distance": (
        "editDistance", "levenshteinDistance",
        "damerauLevenshteinDistance", "jaroSimilarity",
        "jaroWinklerSimilarity", "stringJaccardIndex",
        "byteHammingDistance",
    ),
    "splitting-merging": (
        "splitByChar", "splitByString", "splitByRegexp",
        "splitByWhitespace", "splitByNonAlpha", "arrayStringConcat",
        "alphaTokens", "ngrams", "tokens",
    ),
    "arrays": (
        "arrayJoin", "arrayElement", "has", "hasAll", "hasAny",
        "hasSubstr", "indexOf", "countEqual", "arrayCount", "arrayAll",
        "arrayExists", "arrayMap", "arrayFilter", "arrayFirst",
        "arrayLast", "arrayFirstIndex", "arrayLastIndex", "arrayMin",
        "arrayMax", "arraySum", "arrayAvg", "arrayProduct",
        "arrayCumSum", "arrayCumSumNonNegative", "arrayDifference",
        "arrayDistinct", "arrayEnumerate", "arrayEnumerateDense",
        "arrayEnumerateUniq", "arrayPopBack", "arrayPopFront",
        "arrayPushBack", "arrayPushFront", "arrayResize", "arraySlice",
        "arraySort", "arrayReverseSort", "arrayPartialSort",
        "arrayShuffle", "arrayReverse", "arrayFlatten", "arrayCompact",
        "arrayZip", "arrayConcat", "arrayIntersect", "arrayUnion",
        "arrayJaccardIndex", "arrayReduce", "arrayReduceInRanges",
        "arrayFold", "arrayWithConstant", "arrayRotateLeft",
        "arrayRotateRight", "arrayShiftLeft", "arrayShiftRight",
        "arrayRandomSample", "arrayDotProduct", "arrayUniq", "range",
        "emptyArrayString", "emptyArrayUInt64", "emptyArrayToSingle",
        "length_array",
    ),
    "tuples": (
        "tuple", "tupleElement", "untuple", "tupleHammingDistance",
        "tupleToNameValuePairs", "tuplePlus", "tupleMinus",
        "tupleMultiply", "tupleDivide", "tupleNegate", "tupleConcat",
        "tupleMultiplyByNumber", "tupleDivideByNumber",
    ),
    "maps": (
        "map", "mapFromArrays", "mapAdd", "mapSubtract",
        "mapPopulateSeries", "mapContains", "mapKeys", "mapValues",
        "mapContainsKeyLike", "mapExtractKeyLike", "mapApply",
        "mapFilter", "mapUpdate", "mapConcat", "mapExists", "mapAll",
        "mapSort", "mapReverseSort",
    ),
    "bit": (
        "bitAnd", "bitOr", "bitXor", "bitNot", "bitShiftLeft",
        "bitShiftRight", "bitRotateLeft", "bitRotateRight", "bitTest",
        "bitTestAll", "bitTestAny", "bitCount", "bitHammingDistance",
        "bitSlice",
    ),
    "bitmap": (
        "bitmapBuild", "bitmapToArray", "bitmapSubsetInRange",
        "bitmapSubsetLimit", "subBitmap", "bitmapContains",
        "bitmapHasAny", "bitmapHasAll", "bitmapCardinality",
        "bitmapMin", "bitmapMax", "bitmapTransform", "bitmapAnd",
        "bitmapOr", "bitmapXor", "bitmapAndnot", "bitmapAndCardinality",
        "bitmapOrCardinality", "bitmapXorCardinality",
        "bitmapAndnotCardinality",
    ),
    "datetime": (
        "toYear", "toQuarter", "toMonth", "toDayOfYear", "toDayOfMonth",
        "toDayOfWeek", "toHour", "toMinute", "toSecond",
        "toUnixTimestamp", "toStartOfYear", "toStartOfISOYear",
        "toStartOfQuarter", "toStartOfMonth", "toLastDayOfMonth",
        "toMonday", "toStartOfWeek", "toLastDayOfWeek", "toStartOfDay",
        "toStartOfHour", "toStartOfMinute", "toStartOfSecond",
        "toStartOfFiveMinutes", "toStartOfTenMinutes",
        "toStartOfFifteenMinutes", "toStartOfInterval", "toTime",
        "toISOYear", "toISOWeek", "toWeek", "toYearWeek",
        "toRelativeYearNum", "toRelativeQuarterNum",
        "toRelativeMonthNum", "toRelativeWeekNum", "toRelativeDayNum",
        "toRelativeHourNum", "toRelativeMinuteNum",
        "toRelativeSecondNum", "age", "dateDiff", "dateAdd", "dateSub",
        "timestampDiff", "toDaysSinceYearZero", "fromDaysSinceYearZero",
        "timestampAdd", "timestampSub", "date_trunc", "dateName",
        "monthName", "now", "now64", "nowInBlock", "today", "yesterday",
        "timeSlot", "timeSlots", "toYYYYMM", "toYYYYMMDD",
        "toYYYYMMDDhhmmss", "addYears", "addMonths", "addWeeks",
        "addDays", "addHours", "addMinutes", "addSeconds",
        "subtractYears", "subtractMonths", "subtractWeeks",
        "subtractDays", "subtractHours", "subtractMinutes",
        "subtractSeconds", "formatDateTime",
        "formatDateTimeInJodaSyntax", "fromUnixTimestamp",
        "fromUnixTimestampInJodaSyntax", "toModifiedJulianDay",
        "fromModifiedJulianDay", "UTCTimestamp", "timeZone",
        "serverTimeZone", "toTimeZone", "timeZoneOf", "timeZoneOffset",
        "makeDate", "makeDateTime", "makeDateTime64",
        "monthsBetween", "addInterval", "addTupleOfIntervals",
    ),
    "datetime-parsing": (
        "parseDateTime", "parseDateTimeOrNull", "parseDateTimeInJodaSyntax",
        "parseDateTimeBestEffort", "parseDateTimeBestEffortUS",
        "parseDateTime64BestEffort",
    ),
    "type-conversion": (
        "toInt32", "toInt64", "toUInt32", "toUInt64", "toFloat32",
        "toFloat64", "toInt64OrNull", "toFloat64OrNull", "toDate",
        "toDateTime", "toString", "toFixedString",
        "toStringCutToZero", "reinterpret", "CAST", "accurateCast",
        "accurateCastOrNull", "accurateCastOrDefault",
        "toLowCardinality", "toDecimal64", "toUnixTimestamp64Milli",
        "fromUnixTimestamp64Milli", "formatRow", "formatRowNoNewline",
        "toBool",
    ),
    "json": (
        "simpleJSONHas", "simpleJSONExtractUInt", "simpleJSONExtractInt",
        "simpleJSONExtractFloat", "simpleJSONExtractBool",
        "simpleJSONExtractRaw", "simpleJSONExtractString",
        "visitParamExtractString", "JSONHas", "JSONLength", "JSONType",
        "JSONExtractUInt", "JSONExtractInt", "JSONExtractFloat",
        "JSONExtractBool", "JSONExtractString", "JSONExtract",
        "JSONExtractKeysAndValues", "JSONExtractKeys", "JSONExtractRaw",
        "JSONExtractArrayRaw", "JSONExtractKeysAndValuesRaw",
        "toJSONString", "JSONArrayLength", "JSON_EXISTS", "JSON_QUERY",
        "JSON_VALUE",
    ),
    "url": (
        "protocol", "domain", "domainWithoutWWW", "topLevelDomain",
        "firstSignificantSubdomain", "cutToFirstSignificantSubdomain",
        "port", "path", "pathFull", "queryString", "fragment",
        "queryStringAndFragment", "extractURLParameter",
        "extractURLParameters", "extractURLParameterNames",
        "URLHierarchy", "URLPathHierarchy", "encodeURLComponent",
        "decodeURLComponent", "encodeURLFormComponent",
        "decodeURLFormComponent", "netloc", "cutWWW", "cutQueryString",
        "cutFragment", "cutQueryStringAndFragment", "cutURLParameter",
    ),
    "hash": (
        "halfMD5", "MD4", "MD5", "sipHash64", "sipHash128",
        "cityHash64", "intHash32", "intHash64", "SHA1", "SHA224",
        "SHA256", "SHA512", "BLAKE3", "URLHash", "farmFingerprint64",
        "farmHash64", "javaHash", "hiveHash", "metroHash64",
        "murmurHash2_32", "murmurHash2_64", "gccMurmurHash",
        "murmurHash3_32", "murmurHash3_64", "murmurHash3_128", "xxh3",
        "xxHash32", "xxHash64", "wyHash64", "ngramSimHash",
        "wordShingleSimHash", "ngramMinHash", "wordShingleMinHash",
    ),
    "ip": (
        "IPv4NumToString", "IPv4StringToNum", "IPv4StringToNumOrNull",
        "IPv4NumToStringClassC", "IPv6NumToString", "IPv6StringToNum",
        "IPv4ToIPv6", "cutIPv6", "toIPv4", "toIPv6", "isIPv4String",
        "isIPv6String", "isIPAddressInRange", "IPv4CIDRToRange",
        "IPv6CIDRToRange", "MACNumToString", "MACStringToNum",
        "MACStringToOUI",
    ),
    "encoding": (
        "hex", "unhex", "bin", "unbin", "bitmaskToList",
        "bitmaskToArray", "bitPositionsToArray", "mortonEncode",
        "mortonDecode", "char",
    ),
    "uuid": (
        "generateUUIDv4", "generateUUIDv7", "toUUID", "toUUIDOrNull",
        "toUUIDOrZero", "UUIDStringToNum", "UUIDNumToString",
        "serverUUID",
    ),
    "nullable": (
        "isNull", "isNotNull", "coalesce", "ifNull", "nullIf",
        "assumeNotNull", "toNullable", "isNullable", "isZeroOrNull",
        "isNotDistinctFrom",
    ),
    "distance-vector": (
        "L1Norm", "L2Norm", "L2SquaredNorm", "LinfNorm", "LpNorm",
        "L1Distance", "L2Distance", "L2SquaredDistance", "LinfDistance",
        "LpDistance", "L1Normalize", "L2Normalize", "dotProduct",
        "cosineDistance",
    ),
    "geo": (
        "greatCircleDistance", "geoDistance", "greatCircleAngle",
        "pointInEllipses", "pointInPolygon", "geohashEncode",
        "geohashDecode", "geohashesInBox",
    ),
    "time-window": (
        "tumble", "tumbleStart", "tumbleEnd", "hop", "hopStart",
        "hopEnd",
    ),
    "dictionary": (
        "dictGet", "dictGetOrDefault", "dictGetOrNull", "dictHas",
        "dictGetHierarchy", "dictIsIn",
    ),
    "in-operators": ("in", "notIn", "globalIn", "globalNotIn"),
    "random": (
        "rand", "rand32", "rand64", "randCanonical", "randConstant",
        "randUniform", "randNormal", "randLogNormal", "randBinomial",
        "randomString", "randomPrintableASCII", "fuzzBits",
    ),
    "encryption": (
        "encrypt", "decrypt", "tryDecrypt", "aes_encrypt_mysql",
        "aes_decrypt_mysql",
    ),
    "nlp": (
        "stem", "lemmatize", "synonyms", "detectLanguage",
        "detectLanguageMixed", "detectProgrammingLanguage",
        "detectTonality", "detectCharset",
    ),
    "introspection": (
        "addressToLine", "addressToLineWithInlines", "addressToSymbol",
        "demangle", "tid", "logTrace",
    ),
    "other": (
        "hostName", "getMacro", "FQDN", "basename", "visibleWidth",
        "toTypeName", "blockSize", "byteSize", "materialize", "ignore",
        "sleep", "sleepEachRow", "currentDatabase", "currentUser",
        "isConstant", "hasColumnInTable", "transform",
        "formatReadableDecimalSize", "formatReadableSize",
        "formatReadableQuantity", "formatReadableTimeDelta", "uptime",
        "version", "buildId", "blockNumber", "rowNumberInBlock",
        "rowNumberInAllBlocks", "neighbor", "runningDifference",
        "runningDifferenceStartingWithFirstValue", "runningConcurrency",
        "getSizeOfEnumType", "defaultValueOfArgumentType",
        "defaultValueOfTypeName", "indexHint", "replicate",
        "filesystemAvailable", "filesystemCapacity",
        "filesystemUnreserved", "initialQueryID", "queryID", "shardNum",
        "shardCount", "getOSKernelVersion", "zookeeperSessionUptime",
        "throwIf", "identity", "getSetting", "isFinite", "isInfinite",
        "isNaN", "ifNotFinite", "file", "generateRandomStructure",
        "structureToCapnProtoSchema", "structureToProtobufSchema",
        "formatQuery", "formatQuerySingleLine", "variantElement",
        "minSampleSizeConversion", "minSampleSizeContinuous",
    ),
    "uniqtheta-set": (
        "uniqThetaUnion", "uniqThetaIntersect", "uniqThetaNot",
    ),
    "aggregate": (
        "count", "min", "max", "sum", "avg", "any", "anyHeavy",
        "anyLast", "argMin", "argMax", "avgWeighted", "corr",
        "corrMatrix", "covarPop", "covarSamp", "covarPopMatrix",
        "deltaSum", "deltaSumTimestamp", "entropy",
        "exponentialMovingAverage", "exponentialTimeDecayedAvg",
        "first_value", "last_value", "groupArray", "groupArrayLast",
        "groupArrayInsertAt", "groupArrayIntersect",
        "groupArrayMovingAvg", "groupArrayMovingSum",
        "groupArraySample", "groupArraySorted", "groupArrayArray",
        "groupBitAnd", "groupBitOr", "groupBitXor", "groupBitmap",
        "groupBitmapAnd", "groupBitmapOr", "groupBitmapXor",
        "groupUniqArray", "groupConcat", "histogram",
        "intervalLengthSum", "kolmogorovSmirnovTest", "kurtPop",
        "kurtSamp", "largestTriangleThreeBuckets", "mannWhitneyUTest",
        "maxIntersections", "maxIntersectionsPosition", "maxMap",
        "minMap", "meanZTest", "median", "quantile",
        "quantileDeterministic", "quantileExact", "quantileExactLow",
        "quantileExactHigh", "quantileExactWeighted", "quantileGK",
        "quantileInterpolatedWeighted", "quantileTDigest",
        "quantileTDigestWeighted", "quantileTiming",
        "quantileTimingWeighted", "quantileBFloat16", "quantiles",
        "quantilesExactWeighted", "rankCorr", "simpleLinearRegression",
        "singleValueOrNull", "skewPop", "skewSamp", "sparkbar",
        "stddevPop", "stddevSamp", "stochasticLinearRegression",
        "stochasticLogisticRegression", "studentTTest", "welchTTest",
        "sumCount", "sumKahan", "sumMap", "sumMapFiltered",
        "sumWithOverflow", "theilsU", "topK", "topKWeighted", "uniq",
        "uniqCombined", "uniqCombined64", "uniqExact", "uniqHLL12",
        "uniqTheta", "uniqUpTo", "varPop", "varSamp", "windowFunnel",
        "retention", "sequenceMatch", "sequenceCount",
        "sequenceNextNode", "boundingRatio", "contingency", "cramersV",
        "cramersVBiasCorrected", "categoricalInformationValue",
        "analysisOfVariance", "aggThrow", "flameGraph",
        "countIf", "sumIf", "avgIf", "minIf", "maxIf",
    ),
    "aggregate-combinators": (
        "-If", "-Array", "-Map", "-State", "-Merge", "-MergeState",
        "-ForEach", "-Distinct", "-OrNull", "-OrDefault", "-Resample",
        "-ArgMin", "-ArgMax", "-SimpleState",
    ),
    "window": (
        "row_number", "rank", "dense_rank", "percent_rank", "cume_dist",
        "ntile", "lagInFrame", "leadInFrame", "nth_value",
        "nonNegativeDerivative",
    ),
}

#: Mechanical families recorded once — status applies to every member.
FAMILIES: dict[str, dict[str, str]] = {
    "toInt*/toUInt* width+OrZero/OrNull/OrDefault variants": {
        "members": "toInt8..toInt256, toUInt8..toUInt256, each with "
                   "OrZero/OrNull/OrDefault suffixes (~100 names)",
        "status": "partial",
        "note": "representative widths mapped in CH_FUNCTIONS "
                "(toInt32/64, toUInt32/64, toFloat32/64, OrNull "
                "variants); other widths are Spark CAST synonyms — "
                "Int128/256 unsupported (no Spark 128/256-bit ints)",
    },
    "toDecimal32/64/128/256(+OrNull/OrZero)": {
        "members": "toDecimal32..toDecimal256 and suffix variants",
        "status": "partial",
        "note": "toDecimal64 mapped; wider than 38 digits unsupported "
                "(Spark DecimalType caps at precision 38)",
    },
    "toIntervalYear..toIntervalNanosecond": {
        "members": "9 interval constructors",
        "status": "covered",
        "note": "INTERVAL literals + make_interval in the registry's "
                "CASE/CAST/EXTRACT/INTERVAL query (functions_surface)",
    },
    "h3* geo index functions": {
        "members": "~50 h3ToGeo/geoToH3/h3kRing/... names",
        "status": "unsupported",
        "note": "H3 indexing needs the Uber H3 native lib (not in the "
                "environment); out of analytics-rebuild scope",
    },
    "s2* geo index functions": {
        "members": "~15 s2 cell names",
        "status": "unsupported",
        "note": "same as h3 — native geo-index dependency",
    },
    "parseDateTime* OrZero/OrNull variants": {
        "members": "parseDateTime[64][BestEffort][US][OrZero|OrNull]",
        "status": "partial",
        "note": "best-effort base form mapped (try_to_timestamp "
                "already returns NULL on failure = OrNull semantics); "
                "OrZero epoch-default variants unsupported by choice",
    },
    "toUnixTimestamp64*/fromUnixTimestamp64*": {
        "members": "Milli/Micro/Nano pairs",
        "status": "partial",
        "note": "Milli pair mapped via unix_millis/timestamp_millis "
                "shims; Nano needs TIMESTAMP(NANOS) end-to-end which "
                "Spark lacks (nanosAsLong reads are lossy by design)",
    },
    "divideDecimal/multiplyDecimal exactness bounds": {
        "members": "divideDecimal, multiplyDecimal",
        "status": "covered",
        "note": "r11: Decimal256-grade intermediates emulated on two "
                "decimal(38,0) limbs (multiply: 10^76-wide product as "
                "HI*10^38+LO; divide: chunked long division) — exact "
                "truncate-toward-zero over the full decimal(38,12) "
                "input quantization (|value| < 10^26; divide divisor "
                "|b| < 10^13; result must fit decimal(38,scale)). The "
                "old |value| < 10^12 / |a*b| < 10^14 envelope is gone; "
                "out-of-envelope inputs still NULL rather than "
                "silently round (exercised >= 1e12 end-to-end by "
                "ch_r11_function_surface)",
    },
    "ngramDistance/ngramSearch gram model": {
        "members": "ngramDistance, ngramSearch",
        "status": "covered",
        "note": "computed as exact byte-4-gram multiset measures; "
                "ClickHouse hashes grams into a CRC-keyed bounded map "
                "and special-cases haystacks > 32 KiB (returns 1), so "
                "small divergences from the real engine are possible "
                "on collision-heavy or oversized inputs (r12 advice: "
                "deviation recorded like other approximated surfaces)",
    },
    "r12 promotions: typed/raw JSON extraction": {
        "members": "JSONExtract, JSONExtractRaw, simpleJSONExtractRaw, "
                   "JSONType, JSONExtractKeysAndValues, "
                   "JSONExtractKeysAndValuesRaw, JSONExtractArrayRaw",
        "status": "covered",
        "note": "typed generic JSONExtract routes the trailing CH type "
                "literal through a CH-type→Spark-schema mapping "
                "(Array/Nullable/Map over the scalar base set); pinned "
                "deviations: raw extraction re-serializes compactly "
                "(NON_BIT_COMPATIBLE — differs from CH's raw slice "
                "only on whitespace-bearing documents), and a "
                "type-mismatched node yields NULL where CH fabricates "
                "the type's default value (0/'')",
    },
    "r12 promotions: IPv6 conversions": {
        "members": "IPv6NumToString, IPv6StringToNum, cutIPv6, "
                   "IPv6CIDRToRange",
        "status": "covered",
        "note": "16-byte addresses travel as BINARY (Spark has no "
                "128-bit int); text renders RFC 5952 canonical with "
                "CH's IPv4-mapped dotted-quad special case; "
                "IPv6CIDRToRange returns the (lo, hi) struct as "
                "canonical text rather than IPv6 binary (the same "
                "documented deviation as IPv4CIDRToRange); invalid "
                "input → NULL where CH throws",
    },
    "r12 promotions: byte/bit surface": {
        "members": "CRC32IEEE, CRC64, bitSlice, byteSize, "
                   "convertCharset, currentDatabase, currentUser",
        "status": "covered",
        "note": "CRC32IEEE is a pure-JVM xor identity over crc32, "
                "CRC64 an ECMA-182 table kernel (both bit-exact); "
                "bitSlice returns BINARY (a bit slice is arbitrary "
                "bytes, which UTF-8 Spark strings cannot carry); "
                "byteSize covers the fixed-width scalar set + String "
                "(len+9) — arrays/maps/structs yield NULL; "
                "convertCharset supports the JVM-portable charsets "
                "Spark encode/decode accept (US-ASCII, ISO-8859-1, "
                "UTF-8, UTF-16/BE/LE) vs CH's full ICU set",
    },
    "uniqCombined/quantile* sketch -State interop": {
        "members": "persisted sketch states",
        "status": "unsupported",
        "note": "cross-engine sketch state bytes are not portable "
                "(see NON_BIT_COMPATIBLE in functions/ch.py); -State/"
                "-Merge work within the Spark rebuild only",
    },
}

#: ANSI-SQL surface Spark SQL parses directly — no shim required, the
#: registry queries exercise these inline (core.py, setops.py, ...).
BUILTIN: dict[str, str] = {
    "and": "Spark SQL AND", "or": "Spark SQL OR", "not": "Spark SQL NOT",
    "xor": "boolean != / bitwise ^", "in": "Spark SQL IN",
    "notIn": "Spark SQL NOT IN",
    "globalIn": "IN (shipping is a cluster-topology no-op on Spark; "
                "see join_global_local registry query)",
    "globalNotIn": "NOT IN (same as globalIn)",
    "like": "Spark SQL LIKE", "notLike": "Spark SQL NOT LIKE",
    "ilike": "Spark SQL ILIKE", "notILike": "Spark SQL NOT ILIKE",
    "CAST": "Spark SQL CAST", "count": "Spark SQL count",
    "equals": "=", "notEquals": "<>", "less": "<", "greater": ">",
    "lessOrEquals": "<=", "greaterOrEquals": ">=",
    "regexpExtract": "Spark regexp_extract (same name/shape)",
    "initcap": "Spark initcap", "char": "Spark chr",
    "overlay": "Spark overlay",
    "isNullable": "schema introspection: DataFrame.schema nullable flag",
    "untuple": "struct.* expansion (select(col('t.*')))",
    "median": "percentile_approx(0.5) / registry quantiles query",
    "quantiles": "array of percentile_approx — registry quantiles query",
    "quantileExact": "exact percentile() — registry quantiles query",
    "quantileExactLow": "percentile() lower-interp — quantiles query",
    "quantileExactHigh": "percentile() higher-interp — quantiles query",
}

#: Deliberately out, name by name, with the reason. Categories of
#: reasons: server-introspection (no ClickHouse server process exists
#: in the rebuild), native-dependency, nondeterministic-by-design,
#: engine-internal, out-of-scope.
UNSUPPORTED: dict[str, str] = {
    # --- server / process introspection: no CH server in the rebuild;
    # Spark-equivalent answers come from SparkContext, not SQL
    "zookeeperSessionUptime": "ZooKeeper-specific",
    "addressToLine": "native-binary introspection",
    "addressToLineWithInlines": "native-binary introspection",
    "addressToSymbol": "native-binary introspection",
    "demangle": "native-binary introspection",
    "getSizeOfEnumType": "CH type-system introspection",
    "defaultValueOfArgumentType": "CH type-system introspection",
    "variantElement": "Variant type not in Spark's type system",
    "flameGraph": "profiler-output aggregate",
    # --- nondeterministic by design: rebuild policy is seeded
    # determinism (SURVEY §6); Spark rand(seed)/uuid() exist but a
    # value-parity oracle is impossible by construction
    # --- native/library dependencies absent from the environment
    "lemmatize": "NLP lib dependency",
    "synonyms": "NLP extension dictionaries",
    "BLAKE3": "native hash lib not in Spark/JVM stdlib",
    "sipHash128": "CH's LEGACY non-standard 128-bit fold (pre-sipHash128Reference); no independent implementation exists in-container to certify the fold, and a wrong guess poisons stored-value migration -- sipHash64 itself is the r13 Guava-validated bit-exact SipHash-2-4 kernel",
    # --- bitmap engine type (roaring bitmaps) — no Spark column type
    # --- geo beyond the mapped great-circle/polygon/geohash set
    # --- misc scalar gaps, each with a concrete reason
    "emptyArrayToSingle": "needs the element-type ZERO value ([0]/['']) for an empty input; a Column builder cannot synthesize a typed zero without plan-time schema access (when/otherwise branches must share one type)",
    "tupleToNameValuePairs": "reflection over struct fields; to_json covers serialization",
    "addTupleOfIntervals": "tuple-typed interval batch",
    "firstSignificantSubdomainCustom": "needs the full public-suffix list (the non-Custom fixed-set variant is mapped)",
    "cutToFirstSignificantSubdomainCustom": "full public-suffix list",
    "evalMLMethod": "applies a trained CH model state; kmeans/regression registry queries are the rebuild's ML path",
    "-Resample": "combinator: bucketed re-aggregation; GROUP BY the bucket expr is the relational form",
    "-MergeState": "sketch-state merge output; -State/-Merge covered within-engine",
    "-SimpleState": "storage-level combinator, no query-time semantics",
    "-ForEach": "per-index array aggregation; explode + posexplode GROUP BY is the relational form",
    "-OrDefault": "coalesce composition over -OrNull (covered)",
}

#: Names the audit expects to find implemented as registry queries /
#: operators but whose implementation files don't contain the literal
#: CH spelling (different naming inside the module). name -> evidence.
REGISTRY_OVERRIDES: dict[str, str] = {
    "dictHas": "queries/r7_wave12.py dict_has_or_default (broadcast LEFT-join NULL probe)",
    "dictGetOrDefault": "queries/r7_wave12.py dict_has_or_default (coalesce over broadcast lookup)",
    "first_value": "queries/windows.py (ranking/analytic window query)",
    "last_value": "queries/windows.py",
    "nth_value": "queries/windows.py",
    "percent_rank": "queries/windows.py",
    "cume_dist": "queries/windows.py",
    "ntile": "queries/windows.py + operators/dist_rank.py (dist_ntile)",
    "arrayAUC": "operators/dist_rank.py (array_auc query)",
    "groupBitOr": "queries/types_surface.py (bit aggregate trio)",
    "groupBitXor": "queries/types_surface.py",
    # uniqTheta set-operation estimators = the KMV overlap query
    "uniqThetaUnion": "queries/r6_wave2.py (kmv_user_overlap estimator)",
    "uniqThetaIntersect": "queries/r6_wave2.py (kmv_user_overlap)",
    "uniqThetaNot": "queries/r6_wave2.py (kmv difference via union/intersect identities)",
    # time-window table functions: the streaming windowed aggregations
    "hop": "queries/streaming_queries.py (streaming_sliding_window)",
    "tumbleStart": "queries/streaming_queries.py (window.start on tumbling windows)",
    "tumbleEnd": "queries/streaming_queries.py (window.end)",
    "hopStart": "queries/streaming_queries.py (window.start on sliding windows)",
    "hopEnd": "queries/streaming_queries.py (window.end)",
    # window/aggregate forms implemented as registry queries
    "runningDifference": "queries/extras.py (running_difference: lag window form)",
    "nonNegativeDerivative": "queries/r8_wave3.py (nonnegative_derivative_rate)",
    "groupArraySample": "queries/ch_aggregates_w6.py (seeded reservoir; CH default seed differs)",
    "exponentialTimeDecayedAvg": "queries/ch_aggregates_w7.py (exponential decay family)",
    "quantileDeterministic": "queries/r7_wave10.py (quantile_deterministic: seeded deterministic sampling sketch)",
    # vector norms/distances: JVM-side fold helpers backing the ANN stack
    "L1Norm": "operators/similarity.py (aggregate-fold norms)",
    "L2Norm": "operators/similarity.py (norm())",
    "LinfNorm": "operators/similarity.py (aggregate-fold norms)",
    "L1Distance": "operators/similarity.py (zip_with fold)",
    "L2Distance": "operators/similarity.py (zip_with fold)",
    "L2SquaredDistance": "operators/similarity.py",
    "LinfDistance": "operators/similarity.py",
    "dotProduct": "operators/similarity.py (dot()) + arrayDotProduct in the table",
    "cosineDistance": "operators/similarity.py (cosine() = 1 - distance)",
    # aggregate combinators exercised by registry queries
    "-If": "queries/core.py (uniqExactIf/countIf/sumIf conditional aggregates)",
    "-Array": "queries/ch_aggregates_w6.py (groupArrayArray / -Array flatten)",
    "-Map": "queries/ch_aggregates.py (sumMap/minMap/maxMap family)",
    "-State": "queries/streaming_queries.py hypertable_rollup partials",
    "-Merge": "queries/types_surface.py projection_aggregate merge",
    "-Distinct": "queries/core.py (DISTINCT aggregates query)",
    "-OrNull": "queries/ch_aggregates_w7.py (singleValueOrNull / empty-set null shapes)",
    "-ArgMin": "queries/core.py (argMin via min_by)",
    "-ArgMax": "queries/core.py (argMax via max_by)",
    "maxIntersectionsPosition":
        "queries/ch_aggregates_w6.py (max_intersections at_us column)",
}
