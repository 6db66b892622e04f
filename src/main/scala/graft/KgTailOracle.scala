package graft

import graft.model.Relations
import graft.consistency.Consistency

/**
 * Generator for the q79 DuckDB oracle: an independent SQL restatement of
 * the KG pipeline's relational tail — `KGPipeline.consistentTriples`
 * (distinct-fill election, the X13b/X14/X15/X16/X17/X18 + X12-geo
 * consistency pass, official 2013 rename, noisy-or edge merge,
 * provenance argmax, entity ids) — over the post-linking fills parquet
 * the q79 query dumps.
 *
 * The LOGIC is restated purely in SQL (window functions for the
 * order-free checks; recursive CTE folds for the three SEQUENTIAL
 * checks, where only fills that themselves SURVIVED may kill later
 * fills — X14's approximate dedup, X16's incompatible-pred scan and the
 * X12 geo containment pass). Only the spec DATA is interpolated from
 * the library's ontology/gazetteer constants (single-valued relations,
 * plausible-overlap pairs, official renames, the world-knowledge geo
 * tables) — the same way other oracles read the `documents` fixture.
 *
 * Faithfulness notes: the SQL folds carry the FULL kept list while the
 * engine caps its scans at `Consistency.MaxApproxScan` (256) — they
 * agree on any entity group under the cap (q79's max group is ~15; a
 * >256-fill group would need the cap restated as list_slice). String
 * comparisons (fillOrdering's `pred || obj`, dupOrdering's provenance
 * tiebreaks) assume ASCII surfaces, where UTF-16 code-unit order (Java
 * compareTo) and UTF-8 byte order (DuckDB binary collation) coincide.
 */
object KgTailOracle {

  private def sq(s: String): String = "'" + s.replace("'", "''") + "'"
  private def strList(xs: Iterable[String]): String =
    xs.toSeq.sorted.map(sq).mkString("[", ", ", "]")

  /** lower + strip one trailing dot + plural es/s strip —
   *  Coref.approxTokenMatch's normalizer as a SQL expression over `v`. */
  private def normTok(v: String): String = {
    val t = s"(CASE WHEN ends_with(lower($v), '.') THEN " +
      s"substr(lower($v), 1, length($v) - 1) ELSE lower($v) END)"
    s"(CASE WHEN ends_with($t, 'es') THEN substr($t, 1, length($t) - 2) " +
      s"WHEN ends_with($t, 's') THEN substr($t, 1, length($t) - 1) " +
      s"ELSE $t END)"
  }

  private def approx(a: String, b: String): String =
    s"(lower($a) = lower($b) OR ${normTok(a)} = ${normTok(b)})"

  /** Coref.isAcronymOf(acr, tokens(phrase)) as SQL. */
  private def acronym(acr: String, phrase: String): String = {
    val letters = s"replace($acr, '.', '')"
    val content = s"list_filter(string_split($phrase, ' '), " +
      "zw -> zw <> '' AND regexp_matches(zw, '^[A-Z]'))"
    s"(length($letters) >= 2 AND len($content) = length($letters)" +
      s" AND len(list_filter(range(length($letters))," +
      s" zi -> upper(substr($content[zi + 1], 1, 1))" +
      s" <> upper(substr($letters, zi + 1, 1)))) = 0)"
  }

  /** Approximate-token containment (small set covered by large set). */
  private def containment(x: String, y: String): String = {
    val (tx, ty) = (s"string_split($x, ' ')", s"string_split($y, ' ')")
    def covered(small: String, large: String): String =
      s"(len($small) > 0 AND len(list_filter($small," +
        s" zs -> len(list_filter($large, zl -> ${approx("zs", "zl")})) = 0)) = 0)"
    s"(CASE WHEN len($tx) <= len($ty) THEN ${covered(tx, ty)}" +
      s" ELSE ${covered(ty, tx)} END)"
  }

  /** Consistency.sameValue as a SQL boolean over two VARCHAR exprs. */
  private def sameValue(x: String, y: String): String =
    s"(lower($x) = lower($y) OR ${acronym(x, y)} OR ${acronym(y, x)}" +
      s" OR ${containment(x, y)})"

  /** X12 geoConsistentPair over the kept-state struct `ze` and the
   *  candidate fill's attrs `f2` (roles 0=city, 1=region, 2=country;
   *  gazetteer misses pass — the library's fail-open deviation). */
  private val geoPair: String = """
 (ze.fam <> f2.fam OR ze.role = f2.role
  OR CASE
     WHEN f2.role = 0 AND ze.role = 1 THEN
       NOT (f2.known AND ze.known) OR list_contains(f2.regs, ze.canon)
         OR (ze.canon = 'washington' AND list_contains(f2.regs, 'district of columbia'))
     WHEN f2.role = 1 AND ze.role = 0 THEN
       NOT (f2.known AND ze.known) OR list_contains(ze.regs, f2.canon)
         OR (f2.canon = 'washington' AND list_contains(ze.regs, 'district of columbia'))
     WHEN f2.role = 0 AND ze.role = 2 THEN
       NOT (f2.known AND ze.known) OR list_contains(f2.ctries, ze.canon)
     WHEN f2.role = 2 AND ze.role = 0 THEN
       NOT (f2.known AND ze.known) OR list_contains(ze.ctries, f2.canon)
     WHEN f2.role = 1 AND ze.role = 2 THEN
       NOT (f2.known AND ze.known) OR list_contains(f2.ctries, ze.canon)
     ELSE NOT (f2.known AND ze.known) OR list_contains(ze.ctries, f2.canon)
     END)
"""

  def sql(dumpPath: String): String = {
    val geo = Consistency.geo
    val cityCtries: Map[String, Seq[String]] =
      geo.city2regions.map { case (c, rs) =>
        c -> rs.flatMap(r => geo.region2countries.getOrElse(r, Set.empty))
          .toSeq.sorted
      }
    val citiesVals = geo.city2regions.keys.toSeq.sorted.map { c =>
      s"(${sq(c)}, ${strList(geo.city2regions(c))}, ${strList(cityCtries(c))})"
    }.mkString(",\n    ")
    val regionsVals = geo.region2countries.keys.toSeq.sorted.map { r =>
      s"(${sq(r)}, ${strList(geo.region2countries(r))})"
    }.mkString(",\n    ")
    val countriesVals =
      geo.countries.toSeq.sorted.map(c => s"(${sq(c)})").mkString(", ")
    val lc = (s: String) => s.trim.toLowerCase
    val abbrvVals = geo.abbrv2city.toSeq.sortBy(_._1)
      .map { case (k, v) => s"(${sq(k)}, ${sq(lc(v))})" }.mkString(", ")
    val regUsVals = geo.code2region.collect { case (("US", k), v) => k -> v }
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"(${sq(k)}, ${sq(lc(v))})" }.mkString(", ")
    val regCaVals = geo.code2region.collect { case (("CA", k), v) => k -> v }
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"(${sq(k)}, ${sq(lc(v))})" }.mkString(", ")
    val altcVals = geo.alternateName2country.toSeq.sortBy(_._1)
      .map { case (k, v) => s"(${sq(k)}, ${sq(lc(v))})" }.mkString(", ")
    val code2cVals = geo.code2country.toSeq.sortBy(_._1)
      .map { case (k, v) => s"(${sq(k)}, ${sq(lc(v))})" }.mkString(", ")
    val singlesList =
      Relations.singleValued.toSeq.sorted.map(sq).mkString(", ")
    val plausList = Relations.plausibleOverlap.toSeq.sorted
      .map { case (a, b) => sq(a + "|" + b) }.mkString("[", ", ", "]")
    val renameCase = "CASE pred " + Relations.official2013.toSeq.sortBy(_._1)
      .map { case (k, v) => s"WHEN ${sq(k)} THEN ${sq(v)}" }
      .mkString(" ") + " ELSE pred END"
    val sv = sameValue("zo", "f.obj")

    s"""WITH RECURSIVE
src AS MATERIALIZED (SELECT * FROM read_parquet('$dumpPath/*.parquet')),
dedup AS (SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY subj, pred, obj
      ORDER BY score DESC, subj_type DESC, obj_type DESC, prov_doc_id DESC,
        prov_url DESC, prov_sent_idx DESC, prov_ent_b DESC, prov_ent_e DESC,
        prov_slot_b DESC, prov_slot_e DESC) AS zrn FROM src) WHERE zrn = 1),
ord0 AS MATERIALIZED (SELECT * EXCLUDE (zrn), row_number() OVER (PARTITION BY subj
    ORDER BY score DESC, length(obj) DESC, length(subj) DESC, pred || obj)
    AS zord FROM dedup),
x13b AS (SELECT f.* EXCLUDE (zmo) FROM (SELECT f0.*, m.subj IS NOT NULL AS zmo
    FROM ord0 f0 LEFT JOIN (SELECT DISTINCT subj, obj FROM ord0
      WHERE pred = 'per:member_of') m
      ON m.subj = f0.subj AND m.obj = f0.obj) f
    WHERE NOT (f.pred = 'per:employee_of' AND f.zmo)),
x14i AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY subj, pred
    ORDER BY zord) AS zpi FROM x13b),
x14r(subj, pred, zpi, took, kept) AS (
  SELECT subj, pred, 0, false, CAST([] AS VARCHAR[])
    FROM (SELECT DISTINCT subj, pred FROM x14i)
  UNION ALL
  SELECT r.subj, r.pred, f.zpi,
    len(list_filter(r.kept, zo -> zo <> f.obj AND $sv)) = 0,
    CASE WHEN len(list_filter(r.kept, zo -> zo <> f.obj AND $sv)) = 0
      THEN list_append(r.kept, f.obj) ELSE r.kept END
  FROM x14r r JOIN x14i f ON f.subj = r.subj AND f.pred = r.pred
    AND f.zpi = r.zpi + 1),
x14 AS (SELECT f.* FROM x14i f JOIN x14r r
    ON r.subj = f.subj AND r.pred = f.pred AND r.zpi = f.zpi WHERE r.took),
x15 AS (SELECT * FROM (SELECT f.*, row_number() OVER (PARTITION BY subj,
      pred ORDER BY zord) AS zsr FROM x14 f)
    WHERE pred NOT IN ($singlesList) OR zsr = 1),
x16i AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY subj ORDER BY zord)
    AS zgi FROM x15),
x16r(subj, zgi, took, kept) AS (
  SELECT subj, 0, false,
    CAST([] AS STRUCT(obj VARCHAR, pred VARCHAR)[])
    FROM (SELECT DISTINCT subj FROM x16i)
  UNION ALL
  SELECT r.subj, f.zgi,
    len(list_filter(r.kept, ze -> ze.obj = f.obj AND ze.pred <> f.pred
      AND NOT list_contains($plausList, ze.pred || '|' || f.pred))) = 0,
    CASE WHEN len(list_filter(r.kept, ze -> ze.obj = f.obj
        AND ze.pred <> f.pred
        AND NOT list_contains($plausList, ze.pred || '|' || f.pred))) = 0
      THEN list_append(r.kept, {'obj': f.obj, 'pred': f.pred})
      ELSE r.kept END
  FROM x16r r JOIN x16i f ON f.subj = r.subj AND f.zgi = r.zgi + 1),
x16 AS (SELECT f.* FROM x16i f JOIN x16r r
    ON r.subj = f.subj AND r.zgi = f.zgi WHERE r.took),
x18 AS (SELECT * FROM (SELECT f.*, max(score) OVER (PARTITION BY subj,
      pred) AS zmx FROM x16 f) WHERE score >= 0.01 OR score >= zmx),
x17 AS (SELECT f.* FROM x18 f LEFT JOIN (SELECT DISTINCT subj FROM x18
      WHERE pred = 'per:date_of_death') d ON d.subj = f.subj
    WHERE f.pred NOT IN ('per:city_of_death',
      'per:stateorprovince_of_death', 'per:country_of_death')
    OR d.subj IS NOT NULL),
geo_cities(city, regs, ctries) AS (VALUES
    $citiesVals),
geo_regions(region, ctries) AS (VALUES
    $regionsVals),
geo_countries(name) AS (VALUES $countriesVals),
geo_abbrv(code, city) AS (VALUES $abbrvVals),
geo_reg_us(code, region) AS (VALUES $regUsVals),
geo_reg_ca(code, region) AS (VALUES $regCaVals),
geo_altc(name, country) AS (VALUES $altcVals),
geo_code2c(code, country) AS (VALUES $code2cVals),
geo_pred(pred, fam, role) AS (VALUES
    ('per:city_of_birth', 0, 0), ('per:stateorprovince_of_birth', 0, 1),
    ('per:country_of_birth', 0, 2),
    ('per:city_of_death', 1, 0), ('per:stateorprovince_of_death', 1, 1),
    ('per:country_of_death', 1, 2),
    ('per:cities_of_residence', 2, 0),
    ('per:stateorprovinces_of_residence', 2, 1),
    ('per:countries_of_residence', 2, 2),
    ('org:city_of_headquarters', 3, 0),
    ('org:stateorprovince_of_headquarters', 3, 1),
    ('org:country_of_headquarters', 3, 2)),
geo_attr AS (
  SELECT f.*, gp.fam, gp.role,
    CASE gp.role
      WHEN 0 THEN coalesce(c1.city, c2.city) IS NOT NULL
      WHEN 1 THEN coalesce(r1.region, r2.region) IS NOT NULL
      ELSE co1.name IS NOT NULL OR a1.country IS NOT NULL
        OR a2.country IS NOT NULL OR cc.country IS NOT NULL END AS known,
    CASE gp.role
      WHEN 0 THEN coalesce(c1.city, c2.city, lower(trim(f.obj)))
      WHEN 1 THEN coalesce(r1.region, r2.region, lower(trim(f.obj)))
      ELSE coalesce(co1.name, a1.country, a2.country, cc.country,
        lower(trim(f.obj))) END AS canon,
    CASE gp.role WHEN 0 THEN coalesce(c1.regs, c2.regs, [])
      ELSE [] END AS regs,
    CASE gp.role WHEN 0 THEN coalesce(c1.ctries, c2.ctries, [])
      WHEN 1 THEN coalesce(r1.ctries, r2.ctries, [])
      ELSE [] END AS ctries
  FROM x17 f
  JOIN geo_pred gp ON gp.pred = f.pred
  LEFT JOIN geo_cities c1 ON gp.role = 0 AND c1.city = lower(trim(f.obj))
  LEFT JOIN geo_abbrv ab ON gp.role = 0 AND c1.city IS NULL
    AND ab.code = upper(replace(trim(f.obj), '.', ''))
  LEFT JOIN geo_cities c2 ON c2.city = ab.city
  LEFT JOIN geo_regions r1 ON gp.role = 1
    AND r1.region = lower(trim(f.obj))
  LEFT JOIN geo_reg_us ru ON gp.role = 1 AND r1.region IS NULL
    AND ru.code = upper(replace(trim(f.obj), '.', ''))
  LEFT JOIN geo_reg_ca rc ON gp.role = 1 AND r1.region IS NULL
    AND ru.region IS NULL AND rc.code = upper(replace(trim(f.obj), '.', ''))
  LEFT JOIN geo_regions r2 ON r2.region = coalesce(ru.region, rc.region)
  LEFT JOIN geo_countries co1 ON gp.role = 2
    AND co1.name = lower(trim(f.obj))
  LEFT JOIN geo_altc a1 ON gp.role = 2 AND co1.name IS NULL
    AND a1.name = trim(f.obj)
  LEFT JOIN geo_altc a2 ON gp.role = 2 AND co1.name IS NULL
    AND a1.country IS NULL AND lower(a2.name) = lower(trim(f.obj))
  LEFT JOIN geo_code2c cc ON gp.role = 2 AND co1.name IS NULL
    AND a1.country IS NULL AND a2.country IS NULL
    AND cc.code = upper(replace(trim(f.obj), '.', ''))
    AND length(replace(trim(f.obj), '.', '')) <= 3),
geo_i AS MATERIALIZED (SELECT *, row_number() OVER (PARTITION BY subj ORDER BY zord)
    AS zgei FROM geo_attr),
geo_r(subj, zgei, took, kept) AS (
  SELECT subj, 0, false, CAST([] AS STRUCT(fam INT, role INT,
      canon VARCHAR, known BOOLEAN, regs VARCHAR[], ctries VARCHAR[])[])
    FROM (SELECT DISTINCT subj FROM geo_i)
  UNION ALL
  SELECT r.subj, f2.zgei,
    len(list_filter(r.kept, ze -> NOT $geoPair)) = 0,
    CASE WHEN len(list_filter(r.kept, ze -> NOT $geoPair)) = 0
      THEN list_append(r.kept, {'fam': f2.fam, 'role': f2.role,
        'canon': f2.canon, 'known': f2.known, 'regs': f2.regs,
        'ctries': f2.ctries})
      ELSE r.kept END
  FROM geo_r r JOIN geo_i f2 ON f2.subj = r.subj AND f2.zgei = r.zgei + 1),
geo_kill AS (SELECT f.subj, f.pred, f.obj FROM geo_i f JOIN geo_r r
    ON r.subj = f.subj AND r.zgei = f.zgei WHERE NOT r.took),
surv AS (SELECT f.* FROM x17 f LEFT JOIN geo_kill k ON k.subj = f.subj
    AND k.pred = f.pred AND k.obj = f.obj WHERE k.subj IS NULL),
ren AS (SELECT subj, subj_type, $renameCase AS pred, obj, obj_type,
    score, prov_doc_id, prov_url, prov_sent_idx, prov_ent_b, prov_ent_e,
    prov_slot_b, prov_slot_e FROM surv),
agg AS (SELECT subj, subj_type, pred, obj, obj_type,
    least(1.0, round(1 - product(1 - least(score, 1.0)), 12)) AS score
  FROM ren GROUP BY 1, 2, 3, 4, 5),
pr AS (SELECT *, row_number() OVER (PARTITION BY subj, subj_type, pred,
      obj, obj_type ORDER BY score DESC, prov_doc_id DESC, prov_url DESC,
      prov_sent_idx DESC, prov_ent_b DESC, prov_ent_e DESC,
      prov_slot_b DESC, prov_slot_e DESC) AS zpr FROM ren)
SELECT a.subj,
  'e:' || lower(substr(a.subj_type, 1, 3)) || ':'
    || md5(a.subj_type || '|' || a.subj) AS subj_id,
  a.subj_type, a.pred, a.obj,
  'e:' || lower(substr(a.obj_type, 1, 3)) || ':'
    || md5(a.obj_type || '|' || a.obj) AS obj_id,
  a.obj_type, a.score, p.prov_doc_id, p.prov_url, p.prov_sent_idx
FROM agg a JOIN pr p ON p.subj = a.subj AND p.subj_type = a.subj_type
  AND p.pred = a.pred AND p.obj = a.obj AND p.obj_type = a.obj_type
  AND p.zpr = 1
ORDER BY a.subj, a.subj_type, a.pred, a.obj"""
  }
}
